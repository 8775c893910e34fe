"""Shared utilities (reference: root utils.py — colored printing, folder helpers, seeds)."""

from srl_zoo_tpu.utils.misc import (  # noqa: F401
    createFolder,
    detachToNumpy,
    parseDataFolder,
    printBlue,
    printGreen,
    printRed,
    printYellow,
    set_global_seeds,
)
