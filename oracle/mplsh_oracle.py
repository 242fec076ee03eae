"""The oracle: single-process near-dup detection with MPLSH-style probing.

Semantics mirror SURVEY.md §3.2 S0-S10 exactly, but the execution is the
simplest possible single-address-space realization — per-doc Python loops,
one dict per hash table — deliberately shaped like the canonical C program
the reference denotes (SURVEY.md §0.1: arrays + chained-bucket hash tables,
everything in RAM). The distributed pipeline must reproduce this output
bit-for-bit on the fixture corpus (pytest gate, BASELINE.json:14).

Shared with the pipeline: the low-level hash kernels
(ray_data_mplsh.functions.*) so signatures are comparable; NOT shared: all
grouping / pairing / clustering logic (plain dicts + a classic DSU here vs
shuffles + iterative star contraction there) — which is what the
oracle-equality tests actually exercise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.extract import extract_html, tokenize_batch
from ray_data_mplsh.functions.hashing import (
    MASK_SENTINEL, combine_rows, hash_str_array, make_perm_params,
    minhash_signatures, rolling_shingle_hashes, winnow_fingerprints,
)
from ray_data_mplsh.functions.suffix import (
    cross_match_intervals, merge_intervals, remove_intervals,
)


def canonicalize_url(url: str) -> str:
    """Lowercase scheme+host, strip fragment (SURVEY.md op 8)."""
    base = url.split("#", 1)[0]
    if "://" in base:
        scheme, rest = base.split("://", 1)
        host, slash, path = rest.partition("/")
        return f"{scheme.lower()}://{host.lower()}{slash}{path}"
    return base


class _DSU:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


@dataclass
class OracleResult:
    docs: pa.Table                      # doc_id,url,text,lang,n_chars (post-filter)
    dup_map: dict[int, int]             # exact-dup doc_id -> representative
    sigs: dict[int, np.ndarray]         # rep doc_id -> (K,) uint64
    band_keys: set[tuple]               # (doc_id, band_id, band_hash, probe_rank)
    cand_pairs: set[tuple[int, int]]    # (a,b), a<b
    verified: dict[tuple[int, int], float]
    clusters: dict[int, int]            # every kept doc_id -> cluster_id
    canonical: set[int]                 # is_canonical doc ids (post substring)
    dedup_text: dict[int, str]          # canonical doc_id -> text after span removal
    removed_substring: set[int]         # docs dropped because ~all content was spans
    counters: dict[str, int] = field(default_factory=dict)


def run_oracle(pages: pa.Table, cfg: MPLSHConfig,
               text_col: str = "text", url_col: str = "url",
               extract: bool = False) -> OracleResult:
    # --- S1: extract + filter + ids -------------------------------------
    urls = pages[url_col].to_pylist()
    if extract:
        texts = [extract_html(h) for h in pages["html"].to_pylist()]
    else:
        texts = pages[text_col].to_pylist()
    langs = (pages["lang"].to_pylist() if "lang" in pages.column_names
             else [""] * len(urls))

    rows = []
    for url, text, lang in zip(urls, texts, langs):
        if cfg.langs and lang not in cfg.langs:
            continue
        if len(text) < cfg.min_chars:
            continue
        rows.append((canonicalize_url(url), text, lang))
    doc_ids = hash_str_array([r[0] for r in rows])
    docs = pa.table({
        "doc_id": pa.array(doc_ids, pa.uint64()),
        "url": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })

    # --- S2: exact dedup by text hash (op 23) ---------------------------
    text_h = hash_str_array([r[1] for r in rows])
    by_hash: dict[int, list[int]] = {}
    for did, th in zip(doc_ids.tolist(), text_h.tolist()):
        by_hash.setdefault(th, []).append(did)
    dup_map: dict[int, int] = {}
    reps: list[int] = []
    rep_text: dict[int, str] = {}
    id_to_text = dict(zip(doc_ids.tolist(), [r[1] for r in rows]))
    for members in by_hash.values():
        rep = min(members)
        reps.append(rep)
        rep_text[rep] = id_to_text[rep]
        for m in members:
            if m != rep:
                dup_map[m] = rep
    reps.sort()

    # --- S3: shingle + MinHash (ops 10-12), batched -----------------------
    a, b = make_perm_params(cfg.num_perm, cfg.seed)
    words, offs = tokenize_batch([rep_text[rp] for rp in reps])
    wh = hash_str_array(words) if len(words) else np.empty(0, np.uint64)
    sh, soffs = rolling_shingle_hashes(wh, offs, cfg.k_shingle)
    sig_mat = minhash_signatures(sh, soffs, a, b)
    n_sh = np.diff(soffs)
    sigs: dict[int, np.ndarray] = {
        rp: sig_mat[i] for i, rp in enumerate(reps) if n_sh[i] > 0}

    # --- S4: band + multi-probe keys (op 13; [MPLSH §4]) ----------------
    r = cfg.rows_per_band
    sig_ids = np.array(sorted(sigs), dtype=np.uint64)
    sig_rows = (np.stack([sigs[int(i)] for i in sig_ids])
                if len(sig_ids) else np.empty((0, cfg.num_perm), np.uint64))
    band_keys: set[tuple] = set()
    buckets: dict[tuple[int, int], list[int]] = {}
    for band in range(cfg.bands):
        slots = sig_rows[:, band * r:(band + 1) * r]
        for t in range(cfg.probes + 1):  # t=0 exact, t>=1 masks slot t-1
            key_slots = slots.copy()
            if t > 0:
                key_slots[:, t - 1] = MASK_SENTINEL
            prefix = np.uint64(band * (r + 1) + t)
            bhs = combine_rows(key_slots, prefix=prefix)
            for did, bh in zip(sig_ids.tolist(), bhs.tolist()):
                band_keys.add((did, band, bh, t))
                buckets.setdefault((band, bh), []).append(did)

    # --- S5: candidate pairs with hot-bucket star pairing (ops 14-16) ---
    cand_pairs: set[tuple[int, int]] = set()
    n_star_buckets = 0
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        if len(ms) <= cfg.bucket_cap:
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand_pairs.add((ms[i], ms[j]))
        else:
            n_star_buckets += 1
            anchor = ms[0]
            for m in ms[1:]:
                cand_pairs.add((anchor, m))

    # --- S6: Jaccard verification over signatures (op 18) ---------------
    verified: dict[tuple[int, int], float] = {}
    for pair in cand_pairs:
        pa_, pb_ = pair
        est = float(np.mean(sigs[pa_] == sigs[pb_]))
        if est >= cfg.verify_theta:
            verified[pair] = est

    # --- S7: union-find (op 19) -----------------------------------------
    dsu = _DSU()
    for (x, y) in verified:
        dsu.union(x, y)
    clusters: dict[int, int] = {}
    for rep in sigs:
        clusters[rep] = dsu.find(rep)
    # docs dropped from sigs (unshingleable) are singleton clusters
    for rep in reps:
        clusters.setdefault(rep, rep)
    for m, rep in dup_map.items():
        clusters[m] = clusters[rep]

    # --- S8: canonical pick (op 20) -------------------------------------
    members_of: dict[int, list[int]] = {}
    for did, cid in clusters.items():
        members_of.setdefault(cid, []).append(did)
    canonical = {min(ms) for ms in members_of.values()}

    # --- S9: suffix-array substring pass over survivors (op 24) ---------
    fp_buckets: dict[int, list[int]] = {}
    for did in sorted(canonical):
        text = id_to_text[did]
        fps, _ = winnow_fingerprints(text, cfg.winnow_k, cfg.winnow_w)
        for f in set(fps.tolist()):
            fp_buckets.setdefault(f, []).append(did)
    sub_pairs: set[tuple[int, int]] = set()
    for members in fp_buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        if len(ms) <= cfg.substr_bucket_cap:
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    sub_pairs.add((ms[i], ms[j]))
        else:
            anchor = ms[0]
            for m in ms[1:]:
                sub_pairs.add((anchor, m))
    # Span-removal semantics [Lee22 §3]: every span of >= substr_len bytes
    # that also occurs in an earlier (smaller doc_id) canonical doc is cut
    # from the later doc; the doc itself is dropped only when >90% of its
    # bytes were duplicated spans or the remainder is below min_chars.
    spans: dict[int, list[tuple[int, int]]] = {}
    for (x, y) in sorted(sub_pairs):
        ivals = cross_match_intervals(id_to_text[x], id_to_text[y],
                                      cfg.substr_len)
        if ivals:
            spans.setdefault(y, []).extend(ivals)
    dedup_text: dict[int, str] = {}
    removed: set[int] = set()
    for did in sorted(canonical):
        text = id_to_text[did]
        ivals = merge_intervals(spans.get(did, []))
        new_text = remove_intervals(text, ivals) if ivals else text
        covered = sum(e - s for s, e in ivals)
        if covered > 0.9 * len(text) or len(new_text) < cfg.min_chars:
            removed.add(did)
        else:
            dedup_text[did] = new_text
    canonical -= removed

    return OracleResult(
        docs=docs, dup_map=dup_map, sigs=sigs, band_keys=band_keys,
        cand_pairs=cand_pairs, verified=verified, clusters=clusters,
        canonical=canonical, dedup_text=dedup_text, removed_substring=removed,
        counters={"n_docs": len(rows), "n_reps": len(reps),
                  "n_pairs": len(cand_pairs), "n_verified": len(verified),
                  "n_star_buckets": n_star_buckets})
