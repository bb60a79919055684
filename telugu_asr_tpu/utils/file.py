"""File utilities (reference: src/utils/file_util.py:11-79).

``preprocess_paths`` expands/creates paths like the reference; the reference's
h5-aware tempfile round-trip for remote filesystems (file_util.py:56-79) is
superseded by Orbax's atomic checkpointing, so ``save_file``/``read_file``
reduce to local context managers kept for API parity.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, List, Union

__all__ = ["preprocess_paths", "save_file", "read_file", "is_hdf5_filepath"]


def preprocess_paths(
    paths: Union[str, List[str], None],
    enabled: bool = True,
    check_exists: bool = False,
    isdir: bool = False,
) -> Union[str, List[str], None]:
    """Expand ~ and make absolute; optionally create parents / verify existence."""
    if paths is None or not enabled:
        return paths

    def one(p: str) -> str:
        p = os.path.abspath(os.path.expanduser(p))
        if check_exists and not os.path.exists(p):
            raise FileNotFoundError(p)
        target_dir = p if isdir else os.path.dirname(p)
        if target_dir and not check_exists:
            os.makedirs(target_dir, exist_ok=True)
        return p

    if isinstance(paths, (list, tuple)):
        return [one(p) for p in paths]
    return one(paths)


def is_hdf5_filepath(path: str) -> bool:
    return path.endswith((".h5", ".keras", ".hdf5"))


@contextlib.contextmanager
def save_file(path: str) -> Iterator[str]:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    yield path


@contextlib.contextmanager
def read_file(path: str) -> Iterator[str]:
    yield path
