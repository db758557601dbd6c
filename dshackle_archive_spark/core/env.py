"""Engine tuning knobs read from the environment.

One shared parser so every ``SPARK_GRAFT_*`` integer knob fails the same
way: LOUDLY, naming the variable — a typo'd knob must not surface as a
bare ``ValueError: invalid literal`` deep inside query construction.
(Contrast ``sources/fetcher._env_threads``, which silently ignores bad
values because that is the reference's documented ``parse().ok()``
behavior for the ``EMERALD_DSHACKLE_THREADS_*`` family — reference
parity there, engine ergonomics here.)
"""

from __future__ import annotations

import os


def env_int(name: str, default: int) -> int:
    """``int($name)`` with ``default`` when unset; raises a ValueError
    that names the variable on an unparseable value."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"${name} must be an integer, got {raw!r}") from None
