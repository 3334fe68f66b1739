"""georay — a Ray-Data-native spatial-join + tiling engine.

From-scratch implementation (NOT a port) of the query/data-processing
capabilities of ``fbriol/pangeo-geohash``, generalized into an H3/S2-style
hierarchical cell-index layer over Ray Data pipelines. See SURVEY.md for the
blueprint and provenance notes.
"""

from __future__ import annotations

__version__ = "0.1.0"

from georay import codec  # noqa: F401


def register_by_value() -> None:
    """Ship georay code to Ray workers by value.

    Ray workers deserialize map_batches fns with cloudpickle, which pickles
    module-level functions *by reference*; if the worker process can't import
    ``georay`` (repo not on its sys.path — e.g. a driver launched from another
    cwd), every task dies with ``No module named 'georay'``. Registering the
    package's modules for by-value pickling makes pipelines self-contained
    regardless of the workers' environment. Called at import time below.
    """
    import sys

    try:
        import ray.cloudpickle as cp  # type: ignore
    except Exception:
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == "georay" or name.startswith("georay.")):
            try:
                cp.register_pickle_by_value(mod)
            except Exception:
                pass


def _import_all() -> None:
    """Eagerly import submodules so register_by_value covers them."""
    import importlib

    for name in ("codec", "cells", "geometry", "images", "jpeg", "stages",
                 "io", "runtime", "queries", "ops", "vecindex"):
        try:
            importlib.import_module(f"georay.{name}")
        except ImportError:
            pass  # module not written yet


_import_all()
register_by_value()
