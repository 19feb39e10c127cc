"""The core Block graph runtime.

Semantics match the reference core (dask_geomodeling/core/graphs.py:85-308):
immutable ``Block`` objects form a DAG ("view"); a request is answered by
(a) rewriting it for the sources (``get_sources_and_requests``) and (b)
combining the returned data (static ``process``).  The recursion yields a
compute graph ``{name_token: (process, *args)}`` with structural dedup via
content-addressed keys.

TPU-native difference: ``compute`` consults the configured *executor*.  The
default ("numpy") evaluates the graph with a task scheduler exactly like the
reference.  The "jax" executor (runtime/executor.py) first rewrites maximal
device-capable subgraphs — process functions that carry a ``jax_impl``
attribute — into single jitted XLA programs running on TPU tile batches.
"""
import json
import logging
import sys

from dask_geomodeling_tpu.config import config
from dask_geomodeling_tpu.core.scheduler import get_scheduler, get_sync
from dask_geomodeling_tpu.core.tokens import tokenize

logger = logging.getLogger(__name__)

__all__ = [
    "construct",
    "construct_multiple",
    "compute",
    "arg",
    "Block",
    "DummyBlock",
]


_ARG_MISSING = object()


def arg(index, doc=None, default=_ARG_MISSING):
    """Declarative accessor binding a Block attribute to a constructor
    argument: ``pixel_size = arg(4, "aggregation cell size")``.

    Blocks store their (validated) constructor arguments immutably in
    ``self.args``; most public attributes are direct views onto one slot.
    Declaring them with ``arg`` keeps the slot layout visible at class
    level instead of scattering boilerplate property bodies.

    ``default`` makes the slot optional: graphs serialized before the
    argument existed (shorter ``args`` tuples) keep deserializing.
    """

    def fget(self):
        try:
            return self.args[index]
        except IndexError:
            if default is not _ARG_MISSING:
                return default
            raise

    if doc:
        fget.__doc__ = doc
    return property(fget)


def _construct_exc_callback(e, dumps):
    """``pack_exception`` callback prefixing errors with the failing key."""
    key = sys._getframe(1).f_locals.get("key")
    e.args = ("{0}: {1}".format(key, str(e)),)
    raise e


def _reconstruct_token(key):
    """Recover the 32-hex-digit token a graph key 'SomeName_<token>'
    embeds, or None when the key carries no parseable token suffix."""
    head, _, tail = key.rpartition("_")
    if not head or len(tail) != 32:
        return None
    try:
        int(tail, 16)
    except ValueError:
        return None
    return tail.lower()


def compute(graph, name, *args, **kwargs):
    """Compute a graph ``{name: (func, *args)}`` using the configured
    executor and scheduler.  See :mod:`dask_geomodeling_tpu.config`.
    """
    if config.get("geomodeling.executor", "numpy") == "jax":
        from dask_geomodeling_tpu.runtime.executor import compute_jax

        return compute_jax(graph, name)
    scheduler = get_scheduler()
    return scheduler(graph, [name])[0]


def construct(graph, name, validate=True):
    """Construct a Block with dependent Blocks from a graph and endpoint."""
    return construct_multiple(graph, [name], validate)[0]


def _construction_task(key, value, validate):
    """One scheduler task (callable + args) for a construction-graph item;
    ``value`` is ``[cls_or_import_path, *args]``."""
    cls = value[0]
    if isinstance(cls, str):
        cls = Block.from_import_path(cls)
    if not (isinstance(cls, type) and issubclass(cls, Block)):
        raise TypeError("Cannot construct from object of type '{}'".format(cls))
    if validate:
        return (cls,) + tuple(value[1:])
    token = _reconstruct_token(key)
    if token is None:
        logger.warning(
            "Construct received a key with an invalid name ('%s'), "
            "while validation was turned off",
            key,
        )
    return (cls._init_no_validation, token) + tuple(value[1:])


def construct_multiple(graph, names, validate=True):
    """Construct multiple Blocks from a construction graph.

    With ``validate=False`` the Block ``__init__`` is skipped and the
    token embedded in the key is reused (fast deserialization path).
    """
    tasks = {
        key: _construction_task(key, value, validate)
        for key, value in graph.items()
    }
    return get_sync(tasks, names, pack_exception=_construct_exc_callback)


class Block:
    """A lazy, immutable node in a computation view.

    Subclasses override:

    - ``__init__`` for argument validation (must call ``super().__init__``
      with all args; args are stored immutably in ``self.args``),
    - ``get_sources_and_requests`` to rewrite the request per source
      (default fans out the same request to every arg),
    - static ``process`` to combine the source data (default: identity).

    Evaluation: ``get_data(**request)`` materializes the compute graph and
    hands it to the configured executor.  Tokens (content hashes) make graph
    keys deterministic, enabling structural caching and serialization.
    """

    JSON_VERSION = 2

    def __init__(self, *args):
        self.args = args

    @property
    def token(self):
        """Unique, deterministic content hash of this view."""
        cached = getattr(self, "_cached_token", None)
        if cached is None:
            parts = [
                arg.token if isinstance(arg, Block) else arg
                for arg in self.args
            ]
            cached = self._cached_token = tokenize(
                self.get_import_path(), *parts
            )
        return cached

    @staticmethod  # must remain a static method: it is shipped in graphs
    def process(data):
        """Combine source data; default passes single-source data through."""
        return data

    @classmethod
    def _init_no_validation(cls, token, *args):
        """Construct directly from a token and args, skipping validation."""
        obj = cls.__new__(cls)
        obj.args = args
        if token:
            obj._cached_token = token
        return obj

    def get_sources_and_requests(self, **request):
        """Return an iterable of ``(source, request)`` pairs; requests may
        differ per source.  Non-Block sources are passed to ``process``
        as-is (their request is ignored)."""
        return ((source, request) for source in self.args)

    # --- evaluation (never overridden) ---

    def get_data(self, **request):
        """Directly evaluate the request and return the data."""
        return compute(*self.get_compute_graph(**request))

    def get_compute_graph(self, cached_compute_graph=None, **request):
        """Lazy version of get_data: returns ``(graph, name)`` where graph
        maps ``name_token -> (process, *args)`` and args may reference other
        keys.  Shared (block, request) pairs appear once (structural dedup).
        """
        token = tokenize([self.token, request])
        name = "{}_{}".format(type(self).__name__.lower(), token)
        graph = cached_compute_graph if cached_compute_graph is not None else {}

        if name in graph:
            return graph, name

        args = [self.process]
        for source, req in self.get_sources_and_requests(**request):
            if isinstance(source, Block) and req is not None:
                graph, compute_name = source.get_compute_graph(
                    cached_compute_graph=graph, **req
                )
                args.append(compute_name)
            else:
                args.append(source)

        graph[name] = tuple(args)
        return graph, name

    # --- construction graph / serialization (never overridden) ---

    def get_graph(self, serialize=False):
        """Return ``(graph, name)`` defining this Block and dependencies;
        graph values are ``[cls_or_import_path, *construction_args]``."""
        args = [self.get_import_path()] if serialize else [type(self)]
        graph = {}
        for arg in self.args:
            if isinstance(arg, Block):
                sub_graph, sub_name = arg.get_graph(serialize=serialize)
                graph.update(sub_graph)
                args.append(sub_name)
            else:
                args.append(arg)
        name = self.name
        graph[name] = args
        return graph, name

    @property
    def name(self):
        return "{}_{}".format(type(self).__name__, self.token)

    def __reduce__(self):
        # pickle as (construct, (graph, name, False)): validation skipped
        return construct, self.get_graph() + (False,)

    @classmethod
    def get_import_path(cls):
        """The canonical import path used in serialized graphs; the class
        must resolve back to itself through that path."""
        module, name = cls.__module__, cls.__name__
        try:
            __import__(module)
            resolved = getattr(sys.modules[module], name)
        except (ImportError, KeyError, AttributeError):
            resolved = None
        if resolved is not cls:
            raise RuntimeError(
                "Can't serialize %r: it does not resolve back to %s.%s"
                % (cls, module, name)
            )
        return "%s.%s" % (module, name)

    @staticmethod
    def from_import_path(path):
        module, name = path.rsplit(".", 1)
        # untrusted deserialization surfaces (e.g. the WMS server) restrict
        # which modules may be imported BEFORE any import side effect runs
        allowed = config.get("geomodeling.block-import-paths", None)
        if allowed is not None and not any(
            module == prefix or module.startswith(prefix + ".")
            for prefix in allowed
        ):
            raise TypeError(
                '"{}" is outside the allowed block import paths.'.format(path)
            )
        __import__(module)
        klass = getattr(sys.modules[module], name)
        if isinstance(klass, type) and issubclass(klass, Block):
            return klass
        raise TypeError('"{}" is not a valid Block.'.format(path))

    @classmethod
    def from_json(cls, val, **kwargs):
        return cls.deserialize(json.loads(val, **kwargs))

    def to_json(self, **kwargs):
        kwargs.setdefault("cls", _BlockArgsEncoder)
        return json.dumps(self.serialize(), **kwargs)

    def serialize(self):
        graph, name = self.get_graph(serialize=True)
        return {"version": self.JSON_VERSION, "graph": graph, "name": name}

    @classmethod
    def deserialize(cls, val, validate=False):
        version = val.get("version")
        if version is not None and version > cls.JSON_VERSION:
            logger.warning(
                "Deserializing a version %s graph with a version %s runtime",
                version,
                cls.JSON_VERSION,
            )
        return construct(val["graph"], val["name"], validate=validate)

    def __repr__(self):
        return "{}({})".format(
            type(self).__name__, ", ".join(repr(x) for x in self.args)
        )


class _BlockArgsEncoder(json.JSONEncoder):
    """JSON encoder for common Block argument types.

    Arrays serialize as nested lists (constructors re-coerce them, possibly
    widening the dtype), datetimes as ISO strings and timedeltas as seconds —
    enough for views whose sources are data-carrying (e.g. MemorySource) to
    travel over the WMS 'layers' parameter.
    """

    def default(self, o):
        import datetime

        import numpy as np

        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, datetime.datetime):
            return o.isoformat()
        if isinstance(o, datetime.timedelta):
            return o.total_seconds()
        return super().default(o)


class DummyBlock(Block):
    """Placeholder block carrying a user-supplied name/token.

    Useful for partially evaluating block graphs when computing tokens.
    """

    def __init__(self, name):
        super().__init__(name)

    @property
    def token(self):
        # the token is the part after the LAST underscore: class-name
        # prefixes may themselves contain underscores
        return self.name.rsplit("_", 1)[1]

    @property
    def name(self):
        return self.args[0]
