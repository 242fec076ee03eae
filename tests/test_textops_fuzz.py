"""Adversarial-corpus fuzz for the round-5 text ops (q_pii_scrub,
q_chunk_tokens, q_contam_overlap): the sf documents fixture is
lowercase single-spaced ASCII, so these pins would otherwise never see
the regimes where split / regex / join parity could diverge — multiple
consecutive spaces (empty tokens), empty text, punctuation and
digit-heavy tokens, '@'-bearing words adjacent to the derived PII,
dotted quads already in the text, non-ASCII codepoints, and exact-
duplicate texts across benchmark and non-benchmark doc ids. Each query
is pinned bit-exact against its DuckDB oracle on the same parquet file
(driver-compare semantics: sorted columns, sorted rows, exact values,
matching dtypes)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

FUZZED = ["q_pii_scrub", "q_chunk_tokens", "q_contam_overlap",
          "q_lm_score", "q_paragraph_dedup", "q_dsir_weights",
          "q_token_budget_mixture", "q_ppjoin_pairs",
          "q_ppjoin_clusters", "q_curation_v2",
          "q_soft_dedup_weights", "q_train_split",
          "q_boilerplate_lines", "q_oov_rate", "q_curation_v3",
          "q_bloom_dedup", "q_shard_assign", "q_dup_inflation",
          "q_bow_dedup", "q_prefix_dup_flow", "q_lang_confusion"]

_WORDS = ["the", "ab3", "x", "foo.bar", "semi;colon", "café",
          "10.0.0.7", "a@b.co", "+1-555-0001", "trail.", "(paren)",
          "123", "loooooooooooongword", "über"]


def _write_corpus(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    n = 120
    for i in range(n):
        k = int(rng.integers(0, 90))
        toks = [
            _WORDS[int(j)] for j in rng.integers(0, len(_WORDS), k)]
        t = " ".join(toks)
        style = int(rng.integers(0, 6))
        if style == 0:
            t = ""                                # empty text
        elif style == 1:
            t = "  " + t                          # leading double space
        elif style == 2:
            t = t.replace(" ", "  ", 3)           # internal empty tokens
        elif style == 3:
            t = t + " "                           # trailing space
        texts.append(t)
    # planted exact duplicates spanning the benchmark boundary
    # (doc_id % 37): docs 36 and 37 share text, as do 0 and 1
    texts[37] = texts[36]
    texts[1] = texts[0] = "shared gram " * 6 + "tail"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{i % 4}.Ex" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("name", FUZZED)
def test_textops_fuzz_oracle(ray_session, tmp_path, name, seed):
    d = str(tmp_path)
    _write_corpus(d, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES[name](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL[name]).df()
    con.close()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols, name
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes), name
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a), f"{name}: fuzz corpus produced no rows"


@pytest.mark.parametrize("n_tied,n_free", [(30, 6), (40, 0), (1, 0)])
def test_lm_score_tercile_boundary_ties(ray_session, tmp_path,
                                        n_tied, n_free):
    """The tercile cuts land INSIDE a group of equal-ratio docs (the
    tie_ids branch): a block of identical texts shares one sum_cnt/n_tri
    double, so NTILE's doc_id tie-break decides which side of each cut a
    member falls on. The tied block is the most-probable text (repeated
    trigrams -> highest mean count), so its rank interval starts at 0 and
    straddles both cuts; (40, 0) makes ONE group the whole corpus and
    (1, 0) pins the n=1 NTILE fill rule."""
    d = str(tmp_path)
    n = n_tied + n_free
    texts = ["aaa bbb aaa bbb"] * n_tied + \
        [f"zq{i}x w{i}j kk{i % 3}" for i in range(n_free)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string())}), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_lm_score"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_lm_score"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    if n_tied >= 30:    # the tied block must actually span all 3 tiles
        tied = a[a.doc_id < n_tied]
        assert set(tied.bucket) == {1, 2, 3}


def _write_para_corpus(d: str, seed: int) -> None:
    """Newline-rich corpus for paragraph dedup: multi-paragraph docs
    with cross-doc and WITHIN-doc repeated paragraphs, empty paragraphs
    (consecutive/trailing newlines), newline-only docs, empty docs, and
    docs whose every paragraph is owned elsewhere."""
    rng = np.random.default_rng(seed)
    paras = [f"para {i} body" for i in range(9)] + ["", "shared tail"]
    texts: list[str] = []
    for i in range(80):
        k = int(rng.integers(1, 7))
        ps = [paras[int(j)] for j in rng.integers(0, len(paras), k)]
        t = "\n".join(ps)
        style = int(rng.integers(0, 6))
        if style == 0:
            t = ""                               # zero paragraphs
        elif style == 1:
            t = "\n"                             # two empty paragraphs
        elif style == 2:
            t = t + "\n"                         # trailing empty para
        elif style == 3:
            t = ps[0] + "\n" + ps[0]             # within-doc repeat
        texts.append(t)
    texts[50] = texts[40]                        # whole-doc duplicate
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(80), pa.int64()),
        "text": pa.array(texts, pa.string())}), f"{d}/documents.parquet")


@pytest.mark.parametrize("cap", [4_000_000, 0])
@pytest.mark.parametrize("seed", [5, 19])
def test_paragraph_dedup_multipara(ray_session, tmp_path, cap, seed):
    """Multi-paragraph parity on both physical plans: cap=0 forces the
    exchange fallback (cover rows + doc-keyed padded union), the default
    cap takes the broadcast probe; both must replay the SQL window
    bit-exactly on a corpus with every newline edge."""
    from ray_data_mplsh.pipelines.queries import paragraph_dedup, _read

    d = str(tmp_path)
    _write_para_corpus(d, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = paragraph_dedup(_read(d, "documents", ["doc_id", "text"]),
                          broadcast_max_paras=cap).to_pandas()
    want = con.sql(ORACLE_SQL["q_paragraph_dedup"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert (a.n_removed > 0).any(), "corpus planted no removals"
    assert len(a) == 80, "every doc has >= 1 paragraph, so every doc " \
        "emits a row (empty text = one empty paragraph)"


@pytest.mark.parametrize("seed", [7])
def test_lsh_recall_borderline_misses(ray_session, tmp_path, seed):
    """q_lsh_recall in its informative regime: families whose pairwise
    Jaccard sits just above verify_theta (~0.66-0.75), where the pinned
    16-slot MinHash estimate has high variance — some true pairs fall
    below the est bar (n_hit < n_true) and some sub-theta pairs clear
    it. Parity must hold bit-exactly anyway because the oracle replays
    the same estimate, and recall is the same double ratio."""
    from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(3000)]
    texts = []
    # 12 families: pristine base + 3 members with 2 scattered word
    # edits each -> base-member shingle Jaccard ~ (56-10)/(56+10) ~ 0.7
    # (each edit kills <= 5 shingles of 56), member-member ~ 0.5
    for f in range(12):
        base = [vocab[int(j)] for j in rng.integers(0, 3000, 60)]
        texts.append(" ".join(base))
        for m in range(3):
            doc = list(base)
            for pos in rng.choice(60, size=2, replace=False):
                doc[int(pos)] = vocab[int(rng.integers(0, 3000))]
            texts.append(" ".join(doc))
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_lsh_recall"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_lsh_recall"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    r = a.iloc[0]
    assert r.n_true > 10, "corpus must plant borderline true pairs"
    assert r.n_hit < r.n_true, "16-slot est should miss some"
    assert 0 < r.recall < 1


@pytest.mark.parametrize("cap", [4_000_000, 0])
@pytest.mark.parametrize("seed", [5, 19])
def test_boilerplate_lines_multipara(ray_session, tmp_path, cap, seed):
    """Boilerplate-line scrub parity on both physical plans over the
    same newline-edge corpus as the paragraph-dedup fuzz: cap=0 forces
    the exchange fallback (cover rows + doc-keyed padded union), the
    default cap takes the broadcast probe. Semantics differ from
    paragraph dedup in BOTH directions — a cross-doc line loses every
    instance (no winner survives), a within-doc-only repeat keeps all
    its instances (distinct-doc count is 1)."""
    from ray_data_mplsh.pipelines.queries import (ORACLE_SQL,
                                                  boilerplate_lines,
                                                  _read)

    d = str(tmp_path)
    _write_para_corpus(d, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = boilerplate_lines(_read(d, "documents", ["doc_id", "text"]),
                            broadcast_max_lines=cap).to_pandas()
    want = con.sql(ORACLE_SQL["q_boilerplate_lines"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert (a.n_removed > 0).any(), "corpus planted no boilerplate"
    assert len(a) == 80, "every doc emits a row"


_CDC_WORDS = ["the", "ab3", "x", "foo.bar", "semi;colon",
              "10.0.0.7", "a@b.co", "trail.", "(paren)", "123",
              "loooooooooooongword", "zq"]


@pytest.mark.parametrize("seed", [3, 11])
def test_cdc_chunks_ascii_fuzz(ray_session, tmp_path, seed):
    """q_cdc_chunks on an adversarial ASCII corpus (the oracle folds
    codepoints, so the byte/codepoint parity boundary restricts the
    replay to ASCII — same contract as the SimHash oracle): empty
    texts, leading/double/trailing spaces (empty tokens), punctuation
    tokens, and a planted shared passage at DIFFERENT word offsets in
    several docs — the shifted-duplicate case content-defined chunking
    exists to catch (fixed-stride windows would miss it)."""
    from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

    rng = np.random.default_rng(seed)
    texts: list[str] = []
    shared = " ".join(
        _CDC_WORDS[int(j)] for j in rng.integers(0, len(_CDC_WORDS), 40))
    for i in range(100):
        k = int(rng.integers(0, 60))
        t = " ".join(
            _CDC_WORDS[int(j)] for j in rng.integers(0, len(_CDC_WORDS), k))
        style = int(rng.integers(0, 6))
        if style == 0:
            t = ""
        elif style == 1:
            t = "  " + t
        elif style == 2:
            t = t.replace(" ", "  ", 3)
        elif style == 3:
            t = t + " "
        elif style == 4 and t:
            # shared passage at a random offset: same chunks must
            # resolve to n_copies >= 2 wherever the split lands
            words = t.split(" ")
            pos = int(rng.integers(0, len(words)))
            t = " ".join(words[:pos] + [shared] + words[pos:])
        texts.append(t)
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_cdc_chunks"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_cdc_chunks"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert (a.n_copies >= 2).any(), "shared passage planted no dup chunks"
    assert a.groupby("doc_id").chunk_idx.min().eq(0).all()


def test_dup_inflation_all_dup_source_is_null(ray_session, tmp_path):
    """A source whose EVERY doc is a non-first copy keeps zero tokens:
    its inflation must be NULL (the SQL CASE), not inf/NaN-by-accident,
    and the other sources' ratios must still be bit-exact doubles."""
    d = str(tmp_path)
    texts = ["alpha beta gamma", "delta epsilon"] * 3
    src = ["owner", "owner", "leech", "leech", "leech", "leech"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_dup_inflation"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_dup_inflation"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    leech = a[a.source == "leech"].iloc[0]
    assert pd.isna(leech.inflation) and leech.dup_tokens == leech.n_tokens
    owner = a[a.source == "owner"].iloc[0]
    assert owner.inflation == 1.0 and owner.n_dup_docs == 0


def test_best_of_dup_group_quality_beats_first_wins(ray_session,
                                                    tmp_path):
    """The retention rule must actually BITE: a prefix group where the
    highest-alpha doc is NOT the min doc_id (so the result differs from
    q_normalized_dedup's first-wins rep), an exact alpha TIE resolved
    by min doc_id, punct/case variants sharing one prefix group, and a
    singleton — all bit-exact vs the window-function oracle."""
    d = str(tmp_path)
    head = "the quick brown fox jumps over the lazy dog "  # 44 norm chars
    texts = [
        head + "short tail.",                 # doc 0: min id, LESS alpha
        head + "a much longer and wordier continuation body",  # doc 1 WINS
        head.upper() + "short tail!!!",       # doc 2: same alpha as doc 0
        "zz unique singleton document",       # doc 3: its own group
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s0"] * 4, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_best_of_dup_group"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_best_of_dup_group"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert set(a.keep) == {1, 3}, a   # doc 1 beats doc 0/2 on quality
    assert a[a.keep == 1].n_docs.iloc[0] == 3


def test_best_of_dup_group_alpha_tie_takes_min_id(ray_session,
                                                  tmp_path):
    """All-tied group (identical norm AND alpha): the argmax must fall
    back to min doc_id — i.e. collapse to first-wins, the invariant the
    docstring claims for whole-norm groups."""
    d = str(tmp_path)
    texts = ["Hello, World! One two three four five six seven eight.",
             "hello world one two three four five six seven eight",
             "HELLO WORLD one TWO three FOUR five SIX seven EIGHT?"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s0"] * 3, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_best_of_dup_group"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_best_of_dup_group"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert list(a.keep) == [0] and list(a.n_docs) == [3]


def test_bow_dedup_shuffled_mirror_and_multiset(ray_session, tmp_path):
    """The bag-of-words tier must catch a word-REORDERED mirror (docs 0
    and 1 collapse) while keeping multiset semantics: 'a a b' and
    'a b b' have equal word SETS but different counts and must stay
    separate groups; two empty texts share the '' key."""
    d = str(tmp_path)
    texts = ["one two three four", "four three two one",   # mirror pair
             "a a b", "a b b",                             # count-distinct
             "", ""]                                       # empty group
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s0"] * 6, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_bow_dedup"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_bow_dedup"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    groups = dict(zip(a.rep, a.n_docs))
    assert groups == {0: 2, 2: 1, 3: 1, 4: 2}


def test_prefix_dup_flow_direction(ray_session, tmp_path):
    """Ownership must point at the QUALITY winner's source: 'rich'
    holds the high-alpha copy (not the min doc_id), so both dropped
    docs flow rich <- {poor, mid}; a reverse group where 'poor' wins by
    the min-id tie-break pins the tie arm of the survivor rule."""
    d = str(tmp_path)
    head = "the quick brown fox jumps over the lazy dog "
    texts = [
        head + "tail",                                  # 0 poor, alpha lo
        head + "tail here",                             # 1 mid
        head + "a very long rich continuation of text", # 2 rich WINS
        "zz other prefix body",                         # 3 poor (tie, min id)
        "zz other prefix body",                         # 4 mid (tie, dropped)
    ]
    src = ["poor", "mid", "rich", "poor", "mid"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_prefix_dup_flow"](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL["q_prefix_dup_flow"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    flows = {(r.owner, r.copier): r.n_copies for r in a.itertuples()}
    assert flows == {("rich", "poor"): 1, ("rich", "mid"): 1,
                     ("poor", "mid"): 1}


def test_split_leakage_planted(ray_session, tmp_path):
    """A genuinely leaked eval doc: pick a doc_id the 98/1/1 hash puts
    in test (and one in valid), give them the SAME normalized text as
    two train docs (one differing only in case/punct — the norm key
    must catch it), and one clean held-out doc with n_train_copies = 0.
    The report must cover every held-out doc, zeros included."""
    from ray_data_mplsh.functions.hashing import knuth_hash32

    h = knuth_hash32(np.arange(4000, dtype=np.uint64)) % np.uint64(100)
    test_ids = np.flatnonzero(h == 99)
    valid_ids = np.flatnonzero(h == 98)
    train_ids = np.flatnonzero(h < 98)
    assert len(test_ids) >= 2 and len(valid_ids) >= 1
    leak_t, clean_t = int(test_ids[0]), int(test_ids[1])
    leak_v = int(valid_ids[0])
    ids = [int(train_ids[0]), int(train_ids[1]), int(train_ids[2]),
           leak_t, leak_v, clean_t]
    texts = ["the shared secret passage",   # train copy 1
             "The shared, secret PASSAGE!", # train copy 2 (norm-equal)
             "an unrelated train doc",
             "the shared secret passage",   # leaked test doc (2 copies)
             "an unrelated train doc",      # leaked valid doc (1 copy)
             "a clean held out doc"]        # clean test doc (0 copies)
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s0"] * 6, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_split_leakage"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_split_leakage"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    rep = dict(zip(a.doc_id, a.n_train_copies))
    assert rep == {leak_t: 2, leak_v: 1, clean_t: 0}


def test_lang_confusion_planted(ray_session, tmp_path):
    """Force every matrix cell deterministically: marker words pin the
    argmax (incl. the all-zero tie, which goes to 'de' — the
    lexicographically smallest marker lang) against deliberately wrong
    stored langs."""
    d = str(tmp_path)
    texts = ["the join scan the",        # pred en
             "merge window stream",      # pred de
             "hash spill cache hash",    # pred es
             "nothing here",             # all-zero tie -> de
             "sort shuffle batch sort"]  # pred fr
    stored = ["en", "en", "de", "fr", "fr"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(stored, pa.string()),
        "source": pa.array(["s0"] * 5, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_lang_confusion"](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL["q_lang_confusion"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    cells = {(r.lang, r.pred_lang): r.n_docs for r in a.itertuples()}
    assert cells == {("en", "en"): 1, ("en", "de"): 1, ("de", "es"): 1,
                     ("fr", "de"): 1, ("fr", "fr"): 1}


@pytest.mark.parametrize("seed", [5, 19])
def test_within_doc_line_dedup_newline_edges(ray_session, tmp_path,
                                             seed):
    """The paragraph fuzz corpus has every newline edge — within-doc
    repeats, empty lines (consecutive/trailing newlines), newline-only
    docs, empty docs — and the per-doc first-instance scrub must replay
    the ROW_NUMBER/string_agg oracle bit-exactly on all of them."""
    d = str(tmp_path)
    _write_para_corpus(d, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_within_doc_line_dedup"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_within_doc_line_dedup"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # the scrub must have actually removed something (style-3 docs)
    src = pq.read_table(f"{d}/documents.parquet").to_pandas()
    merged = src.merge(a, on="doc_id", suffixes=("_in", "_out"))
    assert (merged.text_out.str.len() < merged.text_in.str.len()).any()


def test_ccnet_pipeline_gate_and_terciles(ray_session, tmp_path):
    """The composed chain: a doc whose stored lang disagrees with the
    marker prediction must be dropped BEFORE the terciles are cut (so
    the cuts move), and the tail tercile of the kept subcorpus must be
    absent from the output."""
    d = str(tmp_path)
    # 9 kept docs (lang agrees): 3 blocks of graded trigram repetition
    texts = (["the the the join join scan"] * 3      # most probable
             + ["the join scan window here"] * 3     # middle
             + [f"the zq{i}x unique rare trigram mix" for i in range(3)]
             + ["merge window stream"])              # stored en != pred de
    langs = ["en"] * 9 + ["en"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(10), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s0"] * 10, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_ccnet_pipeline"](d).to_pandas()
    want = con.sql(ORACLE_SQL["q_ccnet_pipeline"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert 9 not in set(a.doc_id)         # gate-dropped, not tail-dropped
    assert set(a.bucket) == {1, 2} and len(a) == 6


def test_best_of_near_cluster_quality_beats_min_id(ray_session,
                                                   tmp_path):
    """Retention on the near tier must bite: a 3-doc near-dup family
    where the RICHEST variant (two extra words, so more alpha) is the
    highest doc_id — the cluster's keep must be that doc, not the
    min-id member. Doc 2 is an exact copy of doc 0 (signature Jaccard
    1.0) so the cluster forms regardless of how the estimate treats
    the extended variant."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "one two three four five six seven eight nine ten")
    texts = [base, base + " extra rich tail", base]
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s0"] * 3, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_best_of_near_cluster"](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL["q_best_of_near_cluster"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a) == 1 and a.cluster_id.iloc[0] == 0
    if a.n_docs.iloc[0] == 3:     # extended variant verified into the
        assert a.keep.iloc[0] == 1  # cluster: quality pick must win
    else:                         # estimate rejected it: tie -> min id
        assert a.n_docs.iloc[0] == 2 and a.keep.iloc[0] == 0


def test_skyline_kernel_vs_bruteforce_and_split_invariance():
    """_skyline_2d == the O(n^2) dominance definition on random point
    sets with heavy ties, and the combiner algebra holds: skyline of
    the union of per-chunk partial skylines == skyline of all points
    (what makes the distributed plan exact)."""
    from ray_data_mplsh.pipelines.queries import _skyline_2d

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        x = rng.integers(0, 8, n).astype(np.int64)   # few values: ties
        y = rng.integers(0, 8, n).astype(np.int64)
        ids = np.arange(n, dtype=np.int64)
        got = _skyline_2d(ids, x, y)
        brute = np.array([not any(
            (x[q] <= x[p]) and (y[q] >= y[p])
            and (x[q] < x[p] or y[q] > y[p]) for q in range(n))
            for p in range(n)])
        assert (got == brute).all(), (trial, x.tolist(), y.tolist())
        # combiner algebra: prune per chunk, then skyline the union
        cut = n // 2
        m1 = _skyline_2d(ids[:cut], x[:cut], y[:cut])
        m2 = _skyline_2d(ids[cut:], x[cut:], y[cut:])
        ux = np.concatenate([x[:cut][m1], x[cut:][m2]])
        uy = np.concatenate([y[:cut][m1], y[cut:][m2]])
        uid = np.concatenate([ids[:cut][m1], ids[cut:][m2]])
        mu = _skyline_2d(uid, ux, uy)
        assert set(uid[mu].tolist()) == set(ids[brute].tolist())


def test_skyline_docs_planted_frontier(ray_session, tmp_path):
    """Deterministic frontier: a dense short doc and a rich long doc
    are both on the frontier, equal points are BOTH kept (mutual
    non-domination), and a strictly dominated doc is dropped."""
    d = str(tmp_path)
    texts = ["a b c",           # 3 tokens, 3 distinct — frontier
             "a b c d e f x y", # 8 tokens, 8 distinct — frontier
             "a a a",           # 3 tokens, 1 distinct — dominated by 0
             "a b c",           # tie of doc 0 — kept
             "a b c d e"]       # 5/5 — frontier (between 0 and 1)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["s0"] * 5, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_skyline_docs"](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL["q_skyline_docs"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert set(a.doc_id) == {0, 1, 3, 4}


@pytest.mark.parametrize("n_pairs,expect", [(60, 100), (10, 20)])
def test_reservoir_sample_tie_heavy_and_small(ray_session, tmp_path,
                                              n_pairs, expect):
    """Adversarial h-ties: ids i and i + 2^32 share the same Weyl low
    word, so EVERY key is duplicated and the k-cut lands inside a tie
    pair — the doc_id tie-break and the tie-safe combiner (keep all
    rows at the k-th h) both have to be exact. The small corpus pins
    n < k (all rows returned)."""
    d = str(tmp_path)
    base = np.arange(n_pairs, dtype=np.int64) * 37 + 3
    ids = np.concatenate([base, base + (1 << 32)])
    texts = [f"doc {i}" for i in range(len(ids))]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s0"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES["q_reservoir_sample"](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(ORACLE_SQL["q_reservoir_sample"]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a) == expect
    if expect == 100:   # the cut must have split at least one tie pair
        h_counts = a.groupby("h").doc_id.count()
        assert (h_counts == 1).any() or len(a.h.unique()) == 50


def test_hapax_rate_planted_and_all_hapax(ray_session, tmp_path):
    """Known vocabulary: 'a' occurs 3x, 'b' 2x, c/d/e once each ->
    rate 3/5; and an all-hapax corpus pins rate 1.0."""
    for texts, nv, nh in [
            (["a a b c", "a b d", "e"], 5, 3),
            (["q w", "r t y"], 5, 5)]:
        d = str(tmp_path / f"c{nv}{nh}")
        import os
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
            f"{d}/documents.parquet")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet'")
        got = QUERIES["q_hapax_rate"](d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(ORACLE_SQL["q_hapax_rate"]).df()
        con.close()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert list(a.dtypes) == list(b.dtypes)
        pd.testing.assert_frame_equal(a, b, check_exact=True)
        assert (a.n_vocab.iloc[0], a.n_hapax.iloc[0]) == (nv, nh)
