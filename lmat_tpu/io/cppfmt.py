"""Number formatting byte-compatible with C++ iostream defaults.

The reference writes scores with ``ofs << some_float`` which formats like
printf("%g") at precision 6 after promotion to double.  Python's '%g' uses
the same C library semantics, so formatting the float32 value promoted to
Python float reproduces the bytes.
"""

from __future__ import annotations

import numpy as np


def fmt_float(v) -> str:
    """Format as C++ ostream << float (default 6 significant digits)."""
    return "%g" % float(np.float32(v))


def fmt_double(v) -> str:
    return "%g" % float(v)
