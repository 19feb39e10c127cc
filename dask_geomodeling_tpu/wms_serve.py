"""Standalone WMS server: ``python -m dask_geomodeling_tpu.wms_serve [port]``.

Serves the WSGI app from ipyleaflet_plugin with the stdlib server — handy
for driving views from any WMS client without a Jupyter stack.
"""
import sys
from wsgiref.simple_server import make_server

from dask_geomodeling_tpu.ipyleaflet_plugin import wms_app


def main(port=8787):
    """Serve the WMS WSGI app forever on ``port``."""
    with make_server("", port, wms_app) as httpd:
        print("Serving WMS on port %d (GET /wms?layers=<view json>&...)" % port)
        httpd.serve_forever()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8787)
