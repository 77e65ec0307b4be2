"""Topology-preserving coverage simplification
(`gdal vector simplify-coverage`, apps/gdalalg_vector_simplify_coverage.cpp
— GEOS CoverageSimplifier semantics: polygons sharing edges stay
seamless after simplification).

Algorithm (the standard coverage decomposition):
1. decompose every ring into directed edges; normalize each edge to an
   undirected key → shared edges appear in ≥2 rings;
2. NODES = vertices incident to edges of differing sharing-sets (chain
   breakpoints) — junctions where ≥3 polygons meet, or transitions
   between shared and unshared stretches;
3. split rings into CHAINS between nodes; each undirected chain is
   simplified ONCE (Douglas-Peucker, endpoints pinned) and the result
   substituted into every polygon that references it (forward or
   reversed) — neighbors therefore keep bit-identical shared borders
   (the seamlessness contract);
4. rebuild rings from the simplified chains.

Scope: polygonal coverages without overlaps; holes treated as rings.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geom.ops import simplify_coords


def _vkey(p) -> tuple:
    return (float(p[0]), float(p[1]))


def _ekey(a, b) -> tuple:
    ka, kb = _vkey(a), _vkey(b)
    return (ka, kb) if ka <= kb else (kb, ka)


def simplify_coverage(rings: list[np.ndarray], tolerance: float) -> list[np.ndarray]:
    """rings: list of closed (n,2) rings forming a coverage →
    simplified rings with shared borders kept identical."""
    # open rings (closure vertex dropped; wrap indices instead)
    rings = [
        np.asarray(r, dtype=np.float64)[:-1]
        if (np.asarray(r)[0] == np.asarray(r)[-1]).all()
        else np.asarray(r, dtype=np.float64)
        for r in rings
    ]
    # 1. edge sharing census
    edge_owners: dict[tuple, list[int]] = {}
    for ri, r in enumerate(rings):
        n = len(r)
        for i in range(n):
            edge_owners.setdefault(_ekey(r[i], r[(i + 1) % n]), []).append(ri)
    # 2. per-vertex incident sharing signature -> nodes
    def edge_sig(a, b):
        return tuple(sorted(edge_owners[_ekey(a, b)]))

    nodes: set[tuple] = set()
    for r in rings:
        n = len(r)
        for i in range(n):
            prev_sig = edge_sig(r[i - 1], r[i])
            next_sig = edge_sig(r[i], r[(i + 1) % n])
            if prev_sig != next_sig:
                nodes.add(_vkey(r[i]))
    # 3. split rings into chains between nodes; simplify each chain once
    simplified_chains: dict[tuple, np.ndarray] = {}

    def chain_key(chain: np.ndarray) -> tuple:
        a, b = _vkey(chain[0]), _vkey(chain[-1])
        mid = _vkey(chain[len(chain) // 2])
        return (a, b, len(chain), mid) if (a, b) <= (b, a) else (b, a, len(chain), mid)

    out_rings = []
    for r in rings:
        n = len(r)
        node_idx = [i for i in range(n) if _vkey(r[i]) in nodes]
        if not node_idx:
            # ring has no shared stretches: plain DP on the closed ring
            s = simplify_coords(np.vstack([r, r[:1]]), tolerance)
            out_rings.append(s)
            continue
        pieces = []
        k = len(node_idx)
        for j in range(k):
            i0 = node_idx[j]
            i1 = node_idx[(j + 1) % k]
            if i1 > i0:
                chain = r[i0 : i1 + 1]
            else:
                chain = np.vstack([r[i0:n], r[: i1 + 1]])
            # canonical orientation so both owners simplify identically
            fwd = _vkey(chain[0]) <= _vkey(chain[-1])
            canon = chain if fwd else chain[::-1]
            ck = chain_key(canon)
            if ck not in simplified_chains:
                simplified_chains[ck] = simplify_coords(canon, tolerance)
            s = simplified_chains[ck]
            pieces.append(s if fwd else s[::-1])
        ring = np.vstack([p[:-1] for p in pieces] + [pieces[-1][-1:]])
        # re-close
        if (ring[0] != ring[-1]).any():
            ring = np.vstack([ring, ring[:1]])
        out_rings.append(ring)
    return out_rings
