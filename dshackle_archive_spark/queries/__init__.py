"""Query registry package: every SURVEY §2 operator as a
(Spark builder, oracle SQL) pair, split into per-family modules.

Keys are prefixed with the SURVEY §2 operator id they exercise (p1_, j1_,
a3_, w1_, ...). Importing this package imports every family module, which
registers its queries via the ``@query`` decorator in ``_registry``; the
public surface (``registry()``, ``oracles()``) is unchanged from the
original single-module ``queries.py``.
"""

from __future__ import annotations

from ..core.checkpoint import reliable_checkpoint  # legacy re-export


from ._registry import DEC, QueryFn, _t, oracles, query, registry

# family modules — importing each one registers its @query entries
from . import scan  # noqa: E402,F401


from . import joins  # noqa: E402,F401


from . import aggregates  # noqa: E402,F401


from . import windows  # noqa: E402,F401


from . import ranges  # noqa: E402,F401


from . import tpch  # noqa: E402,F401


from . import dedup  # noqa: E402,F401


from . import text_a  # noqa: E402,F401


from . import text_b  # noqa: E402,F401


from . import vector  # noqa: E402,F401


from . import multimodal  # noqa: E402,F401

__all__ = ["DEC", "QueryFn", "registry", "oracles", "query",
           "reliable_checkpoint"]
