"""Logging: stdlib logging with process-0-only emission.

Replaces the reference's master-only print suppression
(HHI/utils/lam/distributed.py:81-105, HOI/utils/lta/logging.py:18-55).
Under single-controller JAX, "master" is ``jax.process_index() == 0``.
"""

from __future__ import annotations

import logging
import sys


def _is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s",
                              datefmt="%H:%M:%S")
        )
        root = logging.getLogger("egot2x")
        root.addHandler(handler)
        root.setLevel(logging.INFO if _is_master() else logging.ERROR)
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name if name.startswith("egot2x") else f"egot2x.{name}")
