"""Union-find connected-components oracle (no scipy in this container).

The Spark pipeline's large-star/small-star iterative DataFrame job
(operators/cluster.py) must agree with this exact single-process union-find
on the same verified-pair edge list (SURVEY.md §5.2 "e2e: clusters").
Cluster id = minimum member id in the component.
"""

from __future__ import annotations


def union_find_clusters(
    nodes: list, edges: list[tuple]
) -> dict:
    """-> {node: cluster_id} where cluster_id = min node id in component.

    Node ids must be orderable (ints or strings, homogeneous).
    """
    parent: dict = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    # canonicalize: min member per component
    members: dict = {}
    for n in list(parent):
        members.setdefault(find(n), []).append(n)
    out: dict = {}
    for root, ms in members.items():
        cid = min(ms)
        for m in ms:
            out[m] = cid
    return out
