"""Small shared helpers.

Reference: root ``utils.py`` of araffin/srl-zoo (printGreen/Yellow/Red,
parseDataFolder, createFolder, detachToNumpy, seed helpers). Rebuilt, not
ported: detachToNumpy handles JAX arrays instead of torch tensors.
"""

from __future__ import annotations

import os
import random

import numpy as np


def _colored(text: str, code: int) -> str:
    return f"\033[{code}m{text}\033[0m"


def printGreen(text: str) -> None:
    print(_colored(str(text), 32))


def printYellow(text: str) -> None:
    print(_colored(str(text), 33))


def printRed(text: str) -> None:
    print(_colored(str(text), 31))


def printBlue(text: str) -> None:
    print(_colored(str(text), 34))


def parseDataFolder(path: str) -> str:
    """Normalize a dataset folder argument to a bare dataset name.

    Accepts ``data/my_dataset``, ``my_dataset/`` or ``my_dataset`` and returns
    ``my_dataset`` (reference: utils.parseDataFolder).
    """
    path = path.rstrip("/")
    if path.startswith("data/"):
        path = path[len("data/"):]
    return path


def createFolder(path: str, exist_warning: str | None = None) -> None:
    """mkdir -p with an optional warning when the folder already exists."""
    if os.path.exists(path):
        if exist_warning:
            printYellow(exist_warning)
    else:
        os.makedirs(path, exist_ok=True)


def detachToNumpy(x) -> np.ndarray:
    """Convert a device array (JAX) or array-like to a host numpy array."""
    return np.asarray(x)


def set_global_seeds(seed: int) -> None:
    """Seed python and numpy RNGs. JAX randomness is explicit-key, threaded
    through the train step — there is no global JAX seed to set."""
    random.seed(seed)
    np.random.seed(seed)
