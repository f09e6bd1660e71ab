#!/usr/bin/env python3
"""Recall/cost curve for the ANN paths (dev tool, driver-side deps only).

Replicates the repo's exact math in numpy — SRP hyperplanes from
md5("j:i") parity (functions/Vectors.scala srpWeight), IVF lists from
the label column with micro-unit integer centroids (q42), learned lists
from the exact-integer k-means (operators/KMeans.scala) — and measures,
against the exact brute-force top-5 (q40's definition, id tiebreak):

  - mean recall@5 over the query set (vec_id % 50 == 0)
  - candidate fraction: mean |candidate set| / (n-1) per query
    (the sublinearity metric: what share of the corpus the approximate
    path scores)

Usage: python3 tools/ann_curve.py [sfdir ...]
"""
import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq

K = 5


def load(sfdir):
    t = pq.read_table(f"{sfdir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"], dtype=np.int64)
    emb = np.array([np.array(v, dtype=np.float32) for v in t["embedding"]])
    lab = np.array(t["label"])
    order = np.argsort(ids)
    return ids[order], emb[order], lab[order]


def srp_weights(j, dim):
    # Vectors.srpWeight: parity of md5("j:i") first hex nibble
    w = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        nib = hashlib.md5(f"{j}:{i}".encode()).digest()[0] >> 4
        w[i] = 2 * ((nib + 1) % 2) - 1
    return w


def exact_topk(ids, emb, qmask):
    # float64 cosine, same as the double fold; ties broken by id
    e = emb.astype(np.float64)
    nrm = np.sqrt((e * e).sum(axis=1))
    res = {}
    for qi in np.where(qmask)[0]:
        cos = (e @ e[qi]) / (nrm * nrm[qi])
        cand = [(-cos[ci], ids[ci]) for ci in range(len(ids)) if ci != qi]
        cand.sort()
        res[ids[qi]] = {nb for _, nb in cand[:K]}
    return res


def recall_of(cands, ids, emb, qmask, exact):
    """cands: dict query-row-index -> bool mask of candidate rows."""
    e = emb.astype(np.float64)
    nrm = np.sqrt((e * e).sum(axis=1))
    recs, fracs = [], []
    n = len(ids)
    for qi in np.where(qmask)[0]:
        m = cands[qi].copy()
        m[qi] = False
        sel = np.where(m)[0]
        fracs.append(len(sel) / (n - 1))
        cos = (e[sel] @ e[qi]) / (nrm[sel] * nrm[qi])
        order = sorted(zip(-cos, ids[sel]))[:K]
        got = {nb for _, nb in order}
        ex = exact[ids[qi]]
        recs.append(len(got & ex) / len(ex))
    return float(np.mean(recs)), float(np.mean(fracs))


def srp_curve(ids, emb, qmask, exact, settings):
    dim = emb.shape[1]
    maxplanes = max(L * b for L, b in settings)
    W = np.stack([srp_weights(j, dim) for j in range(maxplanes)])
    bits = (emb.astype(np.float64) @ W.T >= 0)  # n x maxplanes
    out = []
    for L, b in settings:
        # bucket code per table t = bits[:, t*b:(t+1)*b]
        codes = np.stack([
            sum(bits[:, t * b + i].astype(np.int64) << i for i in range(b))
            for t in range(L)], axis=1)  # n x L
        cands = {}
        for qi in np.where(qmask)[0]:
            m = (codes == codes[qi]).any(axis=1)
            cands[qi] = m
        r, f = recall_of(cands, ids, emb, qmask, exact)
        out.append((f"SRP L={L} b={b}", r, f))
    return out


def srp_multiprobe_curve(ids, emb, qmask, exact, settings):
    """settings: (L, b, radius) — probe all buckets within hamming
    <= radius of the query's code in each table (query-side explode;
    the corpus is still indexed exactly once per table)."""
    dim = emb.shape[1]
    maxplanes = max(L * b for L, b, _ in settings)
    W = np.stack([srp_weights(j, dim) for j in range(maxplanes)])
    bits = (emb.astype(np.float64) @ W.T >= 0)
    out = []
    for L, b, rad in settings:
        codes = np.stack([
            sum(bits[:, t * b + i].astype(np.int64) << i for i in range(b))
            for t in range(L)], axis=1)
        flips = [0] + ([1 << i for i in range(b)] if rad >= 1 else [])
        cands = {}
        for qi in np.where(qmask)[0]:
            m = np.zeros(len(ids), dtype=bool)
            for t in range(L):
                for f in flips:
                    m |= codes[:, t] == (codes[qi, t] ^ f)
            cands[qi] = m
        r, f = recall_of(cands, ids, emb, qmask, exact)
        out.append((f"SRP-mp L={L} b={b} r={rad}", r, f))
    return out


def ivf_label_curve(ids, emb, lab, qmask, exact, nprobes):
    # q42: centroid = per-label SUM of micro-unit ints (cosine vs query)
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    labs = sorted(set(lab.tolist()))
    cents = {l: q[lab == l].sum(axis=0).astype(np.float64) for l in labs}
    e = emb.astype(np.float64)
    nrm = np.sqrt((e * e).sum(axis=1))
    out = []
    for npb in nprobes:
        cands = {}
        for qi in np.where(qmask)[0]:
            sc = sorted(
                ((-(e[qi] @ cents[l]) / (nrm[qi] * np.sqrt(cents[l] @ cents[l])), l)
                 for l in labs))
            probe = {l for _, l in sc[:npb]}
            cands[qi] = np.isin(lab, list(probe))
        r, f = recall_of(cands, ids, emb, qmask, exact)
        out.append((f"IVF-label nprobe={npb}/{len(labs)}", r, f))
    return out


def kmeans_assign(q, k, iters):
    # operators/KMeans.scala: lowest-id init, exact integer L2,
    # truncating-div centroid update, argmin tie -> lowest cid
    c = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # ties: argmin takes first = lowest cid
        for cid in range(k):
            m = a == cid
            if m.any():
                c[cid] = q[m].sum(axis=0) // m.sum()
    d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), c


def learned_lists(emb, k, iters):
    """Shared q102/q167 coarse structure: assignments + per-list
    truncating-div integer centroids (the Lloyd convention)."""
    qv = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    asg, _ = kmeans_assign(qv, k, iters)
    cents = np.stack([qv[asg == cid].sum(axis=0) // (asg == cid).sum()
                      for cid in range(k)])
    return qv, asg, cents


def ivf_learned_curve(ids, emb, qmask, exact, k, iters, nprobes):
    qv, asg, cents = learned_lists(emb, k, iters)
    out = []
    for npb in nprobes:
        cands = {}
        for qi in np.where(qmask)[0]:
            d = ((qv[qi] - cents) ** 2).sum(axis=1)
            probe = np.argsort(d, kind="stable")[:npb]
            cands[qi] = np.isin(asg, probe)
        r, f = recall_of(cands, ids, emb, qmask, exact)
        out.append((f"IVF-learned k={k} nprobe={npb}", r, f))
    return out


def sq_decode(emb):
    # q163's quantizer: per-dim affine 0..255 codes over corpus min/max
    # on the 1e6 micro-unit ints, integer floor-div decode
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    mn = q.min(axis=0)
    r = q.max(axis=0) - mn
    s = q - mn
    code = np.where(r > 0, (s * 255) // np.maximum(r, 1), 0)
    dec = mn + (code * r) // 255
    return q, dec


def sq8_curve(ids, emb, qmask, exact, budget_denoms):
    """q163: full-corpus SQ proxy scan, exact rerank of the top n/denom.
    cand_frac here = the EXACT-scored fraction (the proxy touches every
    64-byte code row by design — that axis is storage, not selectivity)."""
    q, dec = sq_decode(emb)
    dnf = dec.astype(np.float64)
    dn = np.sqrt((dnf * dnf).sum(axis=1))
    e = emb.astype(np.float64)
    nrm = np.sqrt((e * e).sum(axis=1))
    n = len(ids)
    out = []
    for denom in budget_denoms:
        budget = max(2 * K, n // denom)
        recs = []
        for qi in np.where(qmask)[0]:
            proxy = (dnf @ q[qi].astype(np.float64)) / dn
            proxy[qi] = -np.inf
            sel = np.lexsort((ids, -proxy))[:budget]
            cos = (e[sel] @ e[qi]) / (nrm[sel] * nrm[qi])
            got = {nb for _, nb in sorted(zip(-cos, ids[sel]))[:K]}
            recs.append(len(got & exact[ids[qi]]) / K)
        out.append((f"SQ8 rerank=1/{denom}", float(np.mean(recs)),
                    budget / (n - 1)))
    return out


def ivf_sq_curve(ids, emb, qmask, exact, k, iters, nprobes, denom):
    """q167: learned coarse lists, SQ proxy inside probed lists, exact
    rerank of the top n/denom. cand_frac = exact-scored fraction."""
    qv, asg, cents = learned_lists(emb, k, iters)
    q, dec = sq_decode(emb)
    dnf = dec.astype(np.float64)
    dn = np.sqrt((dnf * dnf).sum(axis=1))
    e = emb.astype(np.float64)
    nrm = np.sqrt((e * e).sum(axis=1))
    n = len(ids)
    out = []
    for npb in nprobes:
        budget = max(2 * K, n // denom)
        recs, fracs = [], []
        for qi in np.where(qmask)[0]:
            d = ((qv[qi] - cents) ** 2).sum(axis=1)
            probe = np.argsort(d, kind="stable")[:npb]
            m = np.isin(asg, probe)
            m[qi] = False
            sel = np.where(m)[0]
            proxy = (dnf[sel] @ q[qi].astype(np.float64)) / dn[sel]
            keep = sel[np.lexsort((ids[sel], -proxy))][:budget]
            fracs.append(len(keep) / (n - 1))
            cos = (e[keep] @ e[qi]) / (nrm[keep] * nrm[qi])
            got = {nb for _, nb in sorted(zip(-cos, ids[keep]))[:K]}
            recs.append(len(got & exact[ids[qi]]) / K)
        out.append((f"IVF-SQ k={k} nprobe={npb} rr=1/{denom}",
                    float(np.mean(recs)), float(np.mean(fracs))))
    return out


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for sfdir in dirs:
        ids, emb, lab = load(sfdir)
        qmask = ids % 50 == 0
        exact = exact_topk(ids, emb, qmask)
        print(f"== {sfdir}: n={len(ids)} queries={qmask.sum()} ==")
        rows = []
        rows += srp_curve(ids, emb, qmask, exact,
                          [(4, 4), (8, 4), (12, 4), (16, 4),
                           (8, 6), (16, 6), (24, 6), (32, 6)])
        rows += srp_multiprobe_curve(ids, emb, qmask, exact,
                                     [(4, 6, 1), (6, 6, 1), (8, 6, 1),
                                      (4, 8, 1), (8, 8, 1), (6, 4, 1)])
        rows += ivf_label_curve(ids, emb, lab, qmask, exact,
                                [1, 3, 4, 5, 6, 7, 8])
        rows += ivf_learned_curve(ids, emb, qmask, exact, 8, 3, [3, 4, 5, 6])
        rows += ivf_learned_curve(ids, emb, qmask, exact, 16, 3,
                                  [4, 6, 8, 10])
        rows += sq8_curve(ids, emb, qmask, exact, [40, 20, 10, 5])
        rows += ivf_sq_curve(ids, emb, qmask, exact, 8, 3, [3, 5], 5)
        for name, r, f in rows:
            print(f"  {name:28s} recall@5={r:0.3f} cand_frac={f:0.3f}")


if __name__ == "__main__":
    main()
