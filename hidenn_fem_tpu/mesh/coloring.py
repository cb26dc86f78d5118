"""Greedy node coloring of the mesh adjacency graph.

Two nodes are adjacent iff they share an element edge, which is exactly
the sparsity pattern of the P1 stiffness matrix — so a proper coloring
lets the stiffness DIAGONAL be extracted exactly, matrix-free, with one
probe matvec per (color, displacement component): for probe ``z_c``
(ones on color-c nodes), ``(K z_c)_i = K_ii`` for every color-c node i
(no two same-color nodes couple).  This generalizes the lattice
(i%2, j%2) coloring of ``solve/multigrid.py`` to unstructured meshes
(``/root/reference`` has no counterpart — it never builds or
preconditions the linear system).

Greedy sequential coloring bounds the count by maxdeg+1; on typical
triangulations it lands at 4-8 colors.  Native C++ via
``mesh/native.py`` when built, numpy/python fallback otherwise.
"""

from __future__ import annotations

import numpy as np

__all__ = ["color_nodes", "check_coloring"]


def _adjacency(connectivity: np.ndarray, n_nodes: int):
    """CSR adjacency (offsets, neighbors) from unique undirected edges."""
    c = np.asarray(connectivity, dtype=np.int64)
    pairs = np.concatenate([c[:, [0, 1]], c[:, [1, 2]], c[:, [0, 2]]])
    pairs.sort(axis=1)
    keys = np.unique(pairs[:, 0] * np.int64(n_nodes) + pairs[:, 1])
    u, v = keys // n_nodes, keys % n_nodes
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    offsets = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(offsets, src + 1, 1)
    np.cumsum(offsets, out=offsets)
    return offsets, dst


def _greedy_color_numpy(connectivity: np.ndarray, n_nodes: int
                        ) -> np.ndarray:
    offsets, adj = _adjacency(connectivity, n_nodes)
    colors = np.full(n_nodes, -1, dtype=np.int32)
    for i in range(n_nodes):
        used = {colors[j] for j in adj[offsets[i]:offsets[i + 1]]
                if colors[j] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def color_nodes(connectivity, n_nodes: int) -> np.ndarray:
    """Proper coloring [n_nodes] int32 of the element-edge adjacency
    graph (native when built, numpy fallback)."""
    from . import native
    if native.available():
        return native.greedy_color(connectivity, n_nodes)
    return _greedy_color_numpy(np.asarray(connectivity), int(n_nodes))


def check_coloring(connectivity, colors) -> bool:
    """True iff no element edge connects same-color nodes."""
    c = np.asarray(connectivity, dtype=np.int64)
    col = np.asarray(colors)
    for a, b in ((0, 1), (1, 2), (0, 2)):
        if np.any(col[c[:, a]] == col[c[:, b]]):
            return False
    return True
