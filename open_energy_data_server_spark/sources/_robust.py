"""Corrupt-input guard for the pure binary decoders.

At 100 TB a landing area WILL contain truncated downloads and
bit-rotted files; a decoder that dies with ``IndexError`` or
``struct.error`` deep in octet math produces an unreadable executor
stack trace. Every public decode entry point is wrapped so any
low-level slicing/unpacking error surfaces as a single, readable
``ValueError("corrupt <format> data: ...")`` — the same contract as
the decoders' own explicit validation raises — which Spark reports
per-task with the file name attached.
"""

from __future__ import annotations

import functools
import lzma
import struct
import zlib

# low-level errors a malformed buffer can trigger inside octet math or
# a compressed payload; anything else (bugs, MemoryError) should
# propagate unchanged
_LOW_LEVEL = (
    struct.error,
    IndexError,
    KeyError,
    OverflowError,
    EOFError,
    lzma.LZMAError,
    zlib.error,
)


def corrupt_guard(fmt: str):
    """Decorator: re-raise low-level parse errors as ValueError."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except ValueError:
                raise
            except _LOW_LEVEL as exc:
                raise ValueError(
                    f"corrupt {fmt} data: {type(exc).__name__}: {exc}"
                ) from exc

        return wrapper

    return deco
