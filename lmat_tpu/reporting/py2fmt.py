"""CPython-2 output semantics for legacy byte-compatibility.

The reference's shipped example outputs (example/example.tgz) were produced
by its Python-2 report scripts: floats printed via py2 ``str()`` (12
significant digits) and some columns emitted in py2 small-int dict hash
order.  The fixture goldens in this repo were regenerated under Python 3, so
these helpers are opt-in (``legacy=True``) for replaying the shipped
artifacts byte-identically (tests/test_golden_example.py).
"""

from __future__ import annotations


def py2_str(x) -> str:
    """Python-2 ``str()`` of a float: %.12g; other types unchanged."""
    if isinstance(x, float):
        return "%.12g" % x
    return str(x)


def py2_int_dict_order(keys):
    """Iteration order of a CPython-2 dict after inserting int ``keys`` in
    the given order (open addressing, table size 8 growing 4x at 2/3 fill,
    probe i = (5i + 1 + perturb), perturb >>= 5)."""

    def insert(slots, mask, k):
        h = k if k != -1 else -2
        i = h & mask
        perturb = h
        while slots[i] is not None and slots[i] != k:
            i = (i * 5 + 1 + perturb) & mask
            perturb >>= 5
        new = slots[i] is None
        slots[i] = k
        return new

    size = 8
    slots = [None] * size
    fill = 0
    for k in keys:
        if insert(slots, size - 1, k):
            fill += 1
        if fill * 3 >= size * 2:
            used = fill
            new_size = 8
            target = used * (2 if used > 50000 else 4)
            while new_size <= target:
                new_size *= 2
            order = [s for s in slots if s is not None]
            size = new_size
            slots = [None] * size
            for kk in order:
                insert(slots, size - 1, kk)
    return [s for s in slots if s is not None]
