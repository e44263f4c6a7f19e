"""Tree-reduce for mergeable state (sketches, stats partials).

The north-star calls for sketches to "merge via tree-reduce aggregation":
pairwise/k-ary merging in remote tasks so no single process ever holds all
partials.  At test scale the driver could merge sequentially; at 100 TB the
partial count is O(shards) and the merge itself must parallelize.

``tree_reduce`` builds a k-ary reduction tree of Ray tasks over a list of
values (or object refs); each level merges ``branch`` children.  The merge
function must be associative (all our sketches are: HLL max-registers,
KLL level-concat, Bloom bitwise-or, stats min/max/sum).
"""

from __future__ import annotations

from typing import Callable, Sequence

import ray


@ray.remote
def _merge_chunk(merge_fn: Callable, items: list):
    # refs nested inside a list are NOT auto-resolved by Ray: fetch manually
    vals = (ray.get(x) if isinstance(x, ray.ObjectRef) else x for x in items)
    it = iter(vals)
    acc = next(it)
    for x in it:
        acc = merge_fn(acc, x)
    return acc


def tree_reduce(items: Sequence, merge_fn: Callable, *, branch: int = 8):
    """Reduce ``items`` (values or ObjectRefs) with a k-ary task tree.

    Returns the final merged value (fetched to the caller).  For small
    inputs (< branch) the merge runs locally — no task overhead."""
    items = list(items)
    if not items:
        raise ValueError("tree_reduce of empty sequence")
    if len(items) <= branch and not any(isinstance(x, ray.ObjectRef) for x in items):
        it = iter(items)
        acc = next(it)
        for x in it:
            acc = merge_fn(acc, x)
        return acc
    refs = [x if isinstance(x, ray.ObjectRef) else ray.put(x) for x in items]
    while len(refs) > 1:
        refs = [
            _merge_chunk.remote(merge_fn, refs[i:i + branch])
            for i in range(0, len(refs), branch)
        ]
    return ray.get(refs[0])
