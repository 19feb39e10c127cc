"""File I/O: native GeoTIFF codec, VRT mosaics, vector formats."""
