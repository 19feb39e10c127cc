"""File URL sandboxing (reference: dask_geomodeling/utils.py:759-807).

Paths are file:// only; relative paths resolve against
``config["geomodeling.root"]``; with ``geomodeling.strict-file-paths`` the
resolved path must stay inside the root.
"""
import os
import warnings

from dask_geomodeling_tpu.config import config

__all__ = ["safe_file_url", "safe_abspath"]


def safe_file_url(url, start=None):
    """Normalize a file URL, enforcing the sandbox rules."""
    try:
        protocol, path = url.split("://")
    except ValueError:
        protocol = "file"
        path = url
    else:
        if protocol != "file":
            raise NotImplementedError('Unknown protocol: "{}"'.format(protocol))
    if start is not None:
        warnings.warn(
            "Using the start argument in safe_file_url is deprecated. Use "
            "'geomodeling.root' in the config",
            DeprecationWarning,
        )
    else:
        start = config.get("geomodeling.root")

    if not os.path.isabs(path):
        if start is None:
            raise IOError(
                "Relative path '{}' provided but start was not given.".format(path)
            )
        abspath = os.path.abspath(os.path.join(start, path))
    else:
        abspath = os.path.abspath(path)
    strict = config.get("geomodeling.strict-file-paths")
    if strict and not abspath.startswith(start):
        raise IOError("'{}' is not contained in '{}'".format(path, start))
    return "://".join([protocol, abspath])


def safe_abspath(url, start=None):
    """Like :func:`safe_file_url` but returns only the absolute path."""
    url = safe_file_url(url, start)
    _, path = url.split("://")
    return path
