"""Process-global memo store that survives cloudpickle by-value module
reconstruction.

``portability.make_portable()`` ships every ``tika_wrap_spark`` module to
executors BY VALUE — and each task deserialization reconstructs a FRESH
module object, so module-level caches (lru_cache state, mutable-default
dicts, module globals) reset on every task (BENCH.md finding 26; measured
as a ~2.5 s per-job wall regression when the AES-256 KDF warm-up was
re-paid by every generation task). Anything that must be computed once per
worker PROCESS therefore has to live on an object cloudpickle never
rebuilds: ``builtins`` is a C module, shared process-wide, and immune to
by-value shipping.
"""

from __future__ import annotations

import builtins


def proc_memo(name: str) -> dict:
    """Return the process-wide memo dict registered under ``name``,
    creating it on first use. Safe under Spark's single-threaded python
    workers; on the driver it is just a module-transcending dict."""
    store = getattr(builtins, "_tws_proc_memos", None)
    if store is None:
        store = {}
        builtins._tws_proc_memos = store
    return store.setdefault(name, {})
