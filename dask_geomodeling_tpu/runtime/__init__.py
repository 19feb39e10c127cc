"""TPU runtime: graph→XLA lowering, program cache, tile batching, mesh."""
