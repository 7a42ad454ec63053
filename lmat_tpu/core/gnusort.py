"""Deterministic clone of libstdc++ std::sort (introsort).

The reference sorts candidate lists with comparators that are not strict weak
orders (TCmp's 1e-3 epsilon tie-break, read_label.cpp:475-485).  With such
comparators the *algorithm* determines the final order of "equivalent"
elements, so byte-identical output requires reproducing libstdc++'s exact
introsort: quicksort with median-of-3 pivot and 16-element threshold, a final
insertion-sort pass, and heapsort beyond the depth limit.
"""

from __future__ import annotations

_THRESHOLD = 16


def gnu_sort(a: list, comp) -> None:
    """In-place sort of `a` with comp(x, y) -> bool ("x < y"), matching
    libstdc++ std::sort element order exactly."""
    n = len(a)
    if n <= 1:
        return
    depth_limit = 2 * (n.bit_length() - 1)
    _introsort_loop(a, 0, n, depth_limit, comp)
    _final_insertion_sort(a, 0, n, comp)


def _introsort_loop(a, first, last, depth_limit, comp):
    while last - first > _THRESHOLD:
        if depth_limit == 0:
            _heap_sort(a, first, last, comp)
            return
        depth_limit -= 1
        cut = _unguarded_partition_pivot(a, first, last, comp)
        _introsort_loop(a, cut, last, depth_limit, comp)
        last = cut


def _move_median_to_first(a, result, x, y, z, comp):
    if comp(a[x], a[y]):
        if comp(a[y], a[z]):
            a[result], a[y] = a[y], a[result]
        elif comp(a[x], a[z]):
            a[result], a[z] = a[z], a[result]
        else:
            a[result], a[x] = a[x], a[result]
    elif comp(a[x], a[z]):
        a[result], a[x] = a[x], a[result]
    elif comp(a[y], a[z]):
        a[result], a[z] = a[z], a[result]
    else:
        a[result], a[y] = a[y], a[result]


def _unguarded_partition(a, first, last, pivot, comp):
    while True:
        while comp(a[first], a[pivot]):
            first += 1
        last -= 1
        while comp(a[pivot], a[last]):
            last -= 1
        if first >= last:
            return first
        a[first], a[last] = a[last], a[first]
        first += 1


def _unguarded_partition_pivot(a, first, last, comp):
    mid = first + (last - first) // 2
    _move_median_to_first(a, first, first + 1, mid, last - 1, comp)
    return _unguarded_partition(a, first + 1, last, first, comp)


def _unguarded_linear_insert(a, last, comp):
    val = a[last]
    nxt = last - 1
    while comp(val, a[nxt]):
        a[nxt + 1] = a[nxt]
        nxt -= 1
    a[nxt + 1] = val


def _insertion_sort(a, first, last, comp):
    if first == last:
        return
    for i in range(first + 1, last):
        if comp(a[i], a[first]):
            val = a[i]
            a[first + 1 : i + 1] = a[first:i]
            a[first] = val
        else:
            _unguarded_linear_insert(a, i, comp)


def _final_insertion_sort(a, first, last, comp):
    if last - first > _THRESHOLD:
        _insertion_sort(a, first, first + _THRESHOLD, comp)
        for i in range(first + _THRESHOLD, last):
            _unguarded_linear_insert(a, i, comp)
    else:
        _insertion_sort(a, first, last, comp)


# --- heap path (only reached past the introsort depth limit) ---------------

def _push_heap(a, first, hole, top, value, comp):
    parent = (hole - 1) // 2
    while hole > top and comp(a[first + parent], value):
        a[first + hole] = a[first + parent]
        hole = parent
        parent = (hole - 1) // 2
    a[first + hole] = value


def _adjust_heap(a, first, hole, length, value, comp):
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if comp(a[first + second], a[first + second - 1]):
            second -= 1
        a[first + hole] = a[first + second]
        hole = second
    if length % 2 == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        a[first + hole] = a[first + second - 1]
        hole = second - 1
    _push_heap(a, first, hole, top, value, comp)


def _make_heap(a, first, last, comp):
    length = last - first
    if length < 2:
        return
    parent = (length - 2) // 2
    while True:
        value = a[first + parent]
        _adjust_heap(a, first, parent, length, value, comp)
        if parent == 0:
            return
        parent -= 1


def _heap_sort(a, first, last, comp):
    _make_heap(a, first, last, comp)
    for cur in range(last, first + 1, -1):
        value = a[cur - 1]
        a[cur - 1] = a[first]
        _adjust_heap(a, first, 0, cur - 1 - first, value, comp)


class CppPriorityQueue:
    """std::priority_queue clone with libstdc++ push_heap/pop_heap element
    order, including the (unspecified-but-deterministic) order of equivalent
    elements — needed to replicate TaxNodeStat's rank-priority pruning
    (TaxNodeStat.hpp:151-206) where the comparator only inspects priorities.
    comp(x, y) means "x < y"; top() is the maximum."""

    def __init__(self, comp):
        self._a = []
        self._comp = comp

    def push(self, value):
        a = self._a
        a.append(value)
        _push_heap(a, 0, len(a) - 1, 0, value, self._comp)

    def pop(self):
        a = self._a
        top = a[0]
        value = a[-1]
        del a[-1]
        if a:
            _adjust_heap(a, 0, 0, len(a), value, self._comp)
        return top

    def top(self):
        return self._a[0]

    def __len__(self):
        return len(self._a)
