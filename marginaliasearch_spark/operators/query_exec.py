"""Query execution: top-k BM25 over the block-compressed postings tables.

Re-expresses the reference's 4-stage query pipeline
(``IndexQueryExecution.java:118-210``: Lookup → Deduplicate → Preparation →
Ranking) as one DataFrame DAG:

- **plan** (driver, = ``SearchContext`` + ``CombinedIndexReader.createQueries``):
  look up per-term document frequencies in the lexicon, order include terms
  rarest-first (``CombinedIndexReader.java:94-97,119-130`` — selectivity
  ordering is OURS to do; Catalyst cannot reorder a semi-join chain);
- **lookup** (= EntrySource + ReverseIndexRetainFilter): decode the rarest
  term's posting blocks into candidates, then for each further term decode
  *pruned* blocks — the candidate doc-id set is shipped to executors and
  blocks whose [min_doc, max_doc] window misses all candidates are skipped
  undecoded (skip-list forward pointers; ``SkipListReader.tryRetainData``);
- **exclusion** (= ReverseIndexRejectFilter): ``left_anti`` join;
- **ranking**: per-term BM25 partials as JVM column expressions, aggregated
  over the compiled query's OR-tree as max-over-paths of sum-along-path
  (``CompiledQueryAggregates.intMaxSumAggregateOfIndexes``), then the
  ascending ``normalize()`` transform (``IndexResultRankingService.java``);
- **select**: ``orderBy(score).limit(k)`` (Spark's TakeOrdered = the top-k
  heap, ``ResultPriorityQueue``) with an optional per-group result cap
  (``row_number`` window = per-domain cap, ``IndexQueryExecution.java:162-177``).

The time-budget / early-termination machinery (``IndexSearchBudget``) is
deliberately omitted: this is a batch engine; block-max metadata + parquet
min/max stats provide the scan pruning instead (SURVEY §2.6 O4 note).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial, reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.blocks import decode_blocks, decoded_schema
from ..functions.scoring import (
    FLAG_BM25_WEIGHT,
    bm25_partial,
    document_penalty,
    first_position_bonus,
    flags_partial,
    normalize,
    optional_group_bonus,
    proximity_bonus,
    verbatim_bonus,
)
from ..plans.parser import ParsedQuery, parse_query
from .index_build import IndexPaths, read_postings
from .ingest import PRIORITY_FLAGS, ROLE_FLAG


@dataclass(frozen=True)
class RankingParams:
    """Optional ranking features beyond the BM25 core.

    ``positional=True`` adds the reference's positional bonuses
    (first-position, verbatim phrase, proximity — SURVEY §5) to the raw
    score before normalization. Divergence note: the reference skips
    position lists longer than 16 entries inside its proximity scan
    (PhraseConstraintGroupList.java, a CPU guard for its row-at-a-time
    scorer); our vectorized kernel computes the exact min spread over all
    positions.

    ``flag_score=True`` adds the reference's second BM25 over flag-derived
    pseudo-counts (``score_bFlags``, IndexResultRankingService.java:139-141)
    at weight 0.5 — see scoring.flags_partial.

    ``penalties=True`` feeds the document bonus/penalty (short-doc +
    rank-bucket quality, scoring.document_penalty) into ``normalize``'s
    penalty argument (IndexResultRankingService.java:155-158) instead of 0.

    ``weighted_counts=True`` scores BM25 with the role-span-weighted count
    (system 2.5 / tool 1.25 / body 1.0 per occurrence — the reference's
    tag-span-weighted ``c``, UnorderedMatches :566-604) instead of the raw
    term frequency. Term presence/DF statistics are unchanged.

    ``temporal_bias='recent'|'old'`` adds the reference's temporal bias
    ``-|year - anchor| * weight`` to the document bonus
    (IndexResultRankingService.java:322-330; scoring.temporal_bias —
    anchored at the index's own max/min year for determinism).
    """

    positional: bool = False
    flag_score: bool = False
    penalties: bool = False
    weighted_counts: bool = False
    temporal_bias: str | None = None
    temporal_bias_weight: float = 5.0


def _min_spread_batch(
    out: np.ndarray,
    row_ids: list[int],
    seqs: list[np.ndarray],
    k: int,
) -> None:
    """Vectorized k-way min-spread for a bucket of rows sharing list
    count ``k`` (``seqs`` holds k arrays per row, row-major).

    The classic smallest-covering-window: with all (value, label) pairs of
    a row sorted by value, the best window ending at position g spans from
    ``m(g) = min over labels of last-occurrence(label) <= g``; the answer
    is ``min over g of vals[g] - vals[m(g)]``. Last-occurrence per label is
    one ``np.maximum.accumulate`` over the whole batch (row boundaries
    handled by comparing against the row's start offset — a stale index
    from a previous row is always below it), so the scan is O(k·N) numpy
    with no Python loop over positions (the reference bounds this scan
    per candidate too: SequenceOperations.java:195-230).
    """
    lens = np.fromiter((s.size for s in seqs), np.int64, count=len(seqs))
    vals = np.concatenate(seqs)
    labels = np.repeat(np.tile(np.arange(k), len(row_ids)), lens)
    rows = np.repeat(
        np.repeat(np.asarray(row_ids, dtype=np.int64), k), lens
    )
    order = np.lexsort((vals, rows))
    vals, labels, rows = vals[order], labels[order], rows[order]
    n = vals.size
    seg_mask = np.empty(n, dtype=bool)
    seg_mask[0] = True
    seg_mask[1:] = rows[1:] != rows[:-1]
    seg_starts = np.flatnonzero(seg_mask)
    idx = np.arange(n)
    row_start = np.maximum.accumulate(np.where(seg_mask, idx, 0))
    m = np.full(n, n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for lab in range(k):
        last = np.maximum.accumulate(np.where(labels == lab, idx, -1))
        valid &= last >= row_start
        np.minimum(m, last, out=m)
    big = np.iinfo(np.int64).max
    spread = np.where(valid, vals - vals[np.clip(m, 0, n - 1)], big)
    per_row = np.minimum.reduceat(spread, seg_starts)
    res = np.where(per_row == big, 0, per_row)
    out[rows[seg_starts]] = np.maximum(res, 0)


def _min_spread_kernel(lists: pd.Series) -> pd.Series:
    """Smallest max-min spread picking one value per sub-list (inputs are
    already order-adjusted by the term's query index). 0 when any list is
    missing/empty or fewer than 2 lists — callers treat 0 as "no bonus"
    (SequenceOperations.minDistance semantics).

    Python touches each row only to validate shape and collect sub-array
    references; all position-level work is batched numpy
    (``_min_spread_batch``) — no per-row sliding-window loop.
    """
    out = np.zeros(len(lists), dtype=np.int32)
    buckets: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    for r, ls in enumerate(lists):
        if ls is None or len(ls) < 2:
            continue
        seqs = [
            np.asarray(l, dtype=np.int64) for l in ls if l is not None and len(l)
        ]
        if len(seqs) != len(ls):
            continue
        rows_b, seqs_b = buckets.setdefault(len(ls), ([], []))
        rows_b.append(r)
        seqs_b.extend(seqs)
    for k, (row_ids, seqs) in buckets.items():
        _min_spread_batch(out, row_ids, seqs, k)
    return pd.Series(out)


def _min_spread_udf(col: F.Column) -> F.Column:
    # pandas_udf is created lazily — the decorator needs an active session
    return F.pandas_udf(_min_spread_kernel, "int")(col)

# Candidate sets up to this size are collected to the driver and shipped to
# decode kernels for block pruning (the reference streams 512-id batches
# through skip lists; our batch analogue prunes whole blocks). Above it we
# fall back to a shuffle semi-join, which is what a 10^12-turn corpus needs
# for stop-word-ish terms anyway.
MAX_DRIVER_CANDIDATES = 2_000_000

# A term whose postings are smaller than this joins faster than the extra
# driver-collect job that block pruning costs; above it, pruning pays.
PRUNE_DF_THRESHOLD = 50_000


def _collect_ids_u64(df: DataFrame, col: str = "doc_id") -> np.ndarray:
    """One long column → uint64 numpy array via an Arrow batch transfer.

    ``toArrow`` streams columnar batches straight into numpy — no
    per-row ``Row`` objects. At the 2M-id ``MAX_DRIVER_CANDIDATES`` cap the
    Row path burned seconds of driver CPU per query; this is the same plan
    with a ~10x cheaper driver step (measured in BASELINE.md)."""
    try:
        tbl = df.toArrow()
        arr = tbl.column(col).to_numpy(zero_copy_only=False)
    except Exception:  # pragma: no cover - non-Arrow fallback
        arr = np.fromiter((r[col] for r in df.collect()), dtype=np.int64)
    return np.asarray(arr, dtype=np.int64).astype(np.uint64)


class IndexReader:
    """Open handle on a built index (lexicon + postings + doc stats)."""

    def __init__(self, spark: SparkSession, paths: IndexPaths):
        self.spark = spark
        self.paths = paths
        self.postings = read_postings(spark, paths)
        self.lexicon = spark.read.parquet(paths.lexicon)
        self.doc_stats = spark.read.parquet(paths.doc_stats)
        # optional priority tier (flagged occurrences only, much smaller);
        # a corpus with no flagged turns writes an EMPTY lang-partitioned
        # dir (no parquet files at all), which can't be read — treat as
        # absent and fall back to the full tier
        self.prio = None
        if os.path.exists(os.path.join(paths.prio, "_SUCCESS")):
            try:
                self.prio = spark.read.parquet(paths.prio)
            except Exception:
                self.prio = None
        # deletion tombstones (index_build.delete_convs): results must
        # never contain these docs; stats stay pre-deletion until
        # compact_index absorbs them (stale-until-reconstruction, as the
        # reference between crawl re-ingests)
        self._year_range: tuple[int, int] | None = None
        self.tombstones = None
        if os.path.exists(os.path.join(paths.tombstones, "_SUCCESS")):
            try:
                self.tombstones = (
                    spark.read.parquet(paths.tombstones)
                    .select("doc_id")
                    .distinct()
                )
            except Exception:
                self.tombstones = None
        with open(paths.corpus_stats) as f:
            stats = json.load(f)
        self.n_docs = float(stats["doc_count"])
        # per-language doc counts + lexicon (reference: per-language
        # WordLexicon) — lang-scoped queries score with these
        self.lang_doc_counts = {
            k: float(v) for k, v in stats.get("lang_doc_counts", {}).items()
        }
        self.lexicon_lang = (
            spark.read.parquet(paths.lexicon_lang)
            if os.path.exists(os.path.join(paths.lexicon_lang, "_SUCCESS"))
            else None
        )
        # optional corpus-derived ngram lexicon (expansion segmentation,
        # reference NgramLexicon analogue — built by index_build.build_ngrams)
        self.ngrams = (
            spark.read.parquet(paths.ngrams)
            if os.path.exists(os.path.join(paths.ngrams, "_SUCCESS"))
            else None
        )
        # actual block geometry of this index (older indexes predate the
        # stat; fall back to the build default) — sizes WAND probe budgets
        from ..functions.blocks import BLOCK_DOCS

        self.block_docs = int(stats.get("block_docs", BLOCK_DOCS))
        # driver-side memo of lexicon/bounds probes: a reader is pinned to
        # one immutable index snapshot, so these tiny lookups never change
        # — the Spark analogue of the reference keeping lexicon B-tree
        # pages hot in its buffer pool (a WAND query alone probes the
        # lexicon three times: wrapper + both phases)
        self._stats_cache: dict[tuple, tuple[int, int] | None] = {}
        self._bounds_cache: dict[int, float | None] = {}
        self._searchset_cache: dict[str, DataFrame | None] = {}

    def search_set(self, name: str) -> DataFrame | None:
        """Persisted search set by name (RankingSearchSet load-at-query);
        None = missing or empty, which imposes NO constraint (the
        reference's contains() quirk, RankingSearchSet.java:73-82)."""
        from .searchset import load_search_set

        if name not in self._searchset_cache:
            try:
                self._searchset_cache[name] = load_search_set(
                    self.spark, self.paths.root, name
                )
            except ValueError:
                # a user-typed set: name outside [a-z0-9_] (the write-path
                # traversal guard) is just an unloadable set — the
                # reference treats those as no-constraint, never an error
                self._searchset_cache[name] = None
        return self._searchset_cache[name]

    @property
    def year_range(self) -> tuple[int, int]:
        """(min, max) document year in the index — the deterministic
        anchors for temporal-bias ranking (one tiny driver probe, memoized;
        the snapshot is immutable)."""
        if self._year_range is None:
            if "year" not in self.doc_stats.columns:
                raise ValueError(
                    "index predates the year stamp; rebuild to use "
                    "temporal_bias"
                )
            r = self.doc_stats.agg(
                F.min("year").alias("lo"), F.max("year").alias("hi")
            ).collect()[0]
            self._year_range = (int(r["lo"]), int(r["hi"]))
        return self._year_range

    def term_bounds(self, term_ids: list[int]) -> dict[int, float]:
        """term_id → global max tf-norm (score UB = idf * max_tf_norm) from
        the tiny term_bounds table — a driver-side pushed-IN probe, the
        skip-list global-max analogue (SkipListReader block maxima).
        Memoized per reader (the snapshot is immutable)."""
        if not term_ids:
            return {}
        missing = [t for t in term_ids if t not in self._bounds_cache]
        if missing:
            tb = self.spark.read.parquet(self.paths.term_bounds)
            rows = tb.filter(F.col("term_id").isin(missing)).collect()
            found = {r["term_id"]: float(r["max_tf_norm"]) for r in rows}
            for t in missing:
                self._bounds_cache[t] = found.get(t)
        return {
            t: self._bounds_cache[t]
            for t in term_ids
            if self._bounds_cache[t] is not None
        }

    # --- planning -----------------------------------------------------
    def term_stats(
        self, words: list[str], lang: str | None = None
    ) -> dict[str, tuple[int, int]]:
        """word → (term_id, df); missing words absent (df=0).

        Driver-side lexicon probe (SearchContext.java:167-178 numHits) —
        a pushed-down IN filter over the lexicon table, tiny result.
        ``lang`` scopes df to one language's lexicon (a word unused in that
        language is 'missing' there, like the reference's per-language
        WordLexicon lookup). Memoized per (lang, word) — the snapshot is
        immutable, and one WAND query re-probes the same words three times.
        """
        if not words:
            return {}
        if lang is not None and self.lexicon_lang is None:
            raise ValueError("index has no per-language lexicon")
        want = list(dict.fromkeys(words))
        missing = [w for w in want if (lang, w) not in self._stats_cache]
        if missing:
            src = self.lexicon
            if lang is not None:
                src = self.lexicon_lang.filter(F.col("lang") == lang)
            rows = src.filter(F.col("term").isin(missing)).collect()
            found = {r["term"]: (r["term_id"], r["df"]) for r in rows}
            for w in missing:
                self._stats_cache[(lang, w)] = found.get(w)
        return {
            w: self._stats_cache[(lang, w)]
            for w in want
            if self._stats_cache[(lang, w)] is not None
        }

    # --- posting access ------------------------------------------------
    def decode_term(
        self,
        term_id: int,
        candidates: np.ndarray | None = None,
        with_positions: bool = False,
        with_wtf: bool = False,
        min_tf_norm: float | None = None,
        top_blocks: int | None = None,
        first_blocks: int | None = None,
        tier: str = "full",
        lang: str | None = None,
    ) -> DataFrame:
        """One term's postings → (doc_id, tf, flags[, positions]).

        The term_id equality predicate prunes parquet row groups via min/max
        stats (postings files are written sorted by term_id); the candidate
        array prunes blocks before decode. ``min_tf_norm`` is the block-max
        WAND cut: blocks whose score upper bound (idf * max_tf_norm) cannot
        reach the current top-k threshold are skipped at the parquet scan
        (predicate on the max_tf_norm column → row-group stats pruning).
        ``top_blocks`` restricts to the N highest-max_tf_norm blocks (the
        threshold-estimation phase of two-phase top-k). ``first_blocks``
        restricts to the N lowest-doc-id blocks — with rank-stamped ids
        (functions/ids.py) those hold the best-quality documents, which is
        the reference's budgeted-scan semantics (IndexSearchBudget: a
        truncated scan is sound BECAUSE docID order is quality order).
        """
        source = self.prio if (tier == "prio" and self.prio is not None) else self.postings
        blocks = source.filter(F.col("term_id") == term_id)
        if lang is not None and "lang" in source.columns:
            # postings are written partitioned by the doc's language, so a
            # lang-scoped query prunes whole lang=... directories at the
            # scan (PartitionFilters) instead of filtering after the join —
            # the per-language reverse index of the reference
            blocks = blocks.filter(F.col("lang") == lang)
        if min_tf_norm is not None:
            blocks = blocks.filter(F.col("max_tf_norm") >= min_tf_norm)
        if top_blocks is not None:
            blocks = blocks.orderBy(F.desc("max_tf_norm")).limit(top_blocks)
        if first_blocks is not None:
            blocks = blocks.orderBy("min_doc").limit(first_blocks)
        # column pruning into the parquet scan: the positions payload (the
        # widest column) is only read when the query needs positions
        cols = ["term_id", "n_docs", "doc_ids", "tfs", "flags", "min_doc", "max_doc"]
        if with_wtf:
            cols.insert(4, "wtfs")
        if with_positions:
            cols.insert(4, "positions")
        fn = partial(
            decode_blocks,
            with_positions=with_positions,
            with_wtf=with_wtf,
            candidates=candidates,
        )
        schema = decoded_schema(with_positions, with_wtf)
        return blocks.select(*cols).mapInPandas(fn, schema=schema).drop("term_id")


def _safe(word: str) -> str:
    """Column-name-safe token alias (terms may contain . - / : etc., which
    break unquoted column references)."""
    import zlib

    return f"w{zlib.crc32(word.encode()):08x}"


def _phrase_filter(cand: DataFrame, phrase: list[str]) -> DataFrame:
    """Adjacency constraint via JVM array expressions (no Python).

    A phrase t0..tm matches when some base position p has t_i at p+i for all
    i — the offset-shifted position intersection of the reference
    (``SequenceOperations.findIntersections``), expressed with
    ``filter``/``array_contains`` so it stays in whole-stage codegen.
    """
    base = F.col(f"pos_{_safe(phrase[0])}")
    cond = lambda p: reduce(  # noqa: E731
        lambda acc, i: acc
        & F.array_contains(F.col(f"pos_{_safe(phrase[i])}"), p + i),
        range(1, len(phrase)),
        F.lit(True),
    )
    return cand.filter(F.size(F.filter(base, cond)) > 0)


def run_query(
    reader: IndexReader,
    query: str | ParsedQuery,
    k: int = 10,
    group_cap: int | None = None,
    group_col: str = "conv_id",
    round_score_to: int | None = None,
    tie_break: F.Column | None = None,
    ranking: RankingParams | None = None,
    budget_blocks: int | None = None,
    lang: str | None = None,
    blocklist: DataFrame | None = None,
    safe_tier: int = 0,
    _driver_top_blocks: int | None = None,
    _driver_min_tf_norm: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k BM25 search. Returns (doc_id, conv_id, score, ...) ascending by
    the reference's normalized score (lower = better).

    ``tie_break``: optional column expression used instead of ``doc_id`` to
    break score ties deterministically (e.g. an external id recoverable from
    ``conv_id`` so results are comparable with an engine that does not know
    our hash-based doc ids).

    ``budget_blocks``: opt-in approximate mode — only the driver term's
    first N blocks in doc-id order are scanned. With rank-stamped ids this
    is the reference's budgeted scan (IndexSearchBudget): truncation is
    sound because docID order is quality order, so the scanned prefix holds
    the best documents.
    """
    pq = parse_query(query) if isinstance(query, str) else query
    if lang is None:
        lang = pq.lang  # `lang:xx` query syntax; explicit param wins
    include_terms = pq.all_include_terms()
    phrase_terms = sorted({w for ph in pq.phrases for w in ph})
    # lang-scoped queries take df/N from that language's lexicon partition
    # and restrict candidates to its documents (per-language index surface)
    stats = reader.term_stats(
        include_terms + pq.exclude + pq.priority + pq.advice, lang=lang
    )
    n_corpus = (
        reader.lang_doc_counts.get(lang, 0.0) if lang is not None else reader.n_docs
    )

    # any required include term missing from the lexicon on an AND-only
    # query → empty result; OR paths drop the missing alternatives
    paths = pq.include.paths() if pq.include is not None else [[]]
    live_paths = [p for p in paths if all(w in stats for w in p)]
    def empty() -> DataFrame:
        return (
            reader.doc_stats.select("doc_id", "conv_id", "doc_len", "n_turns")
            .withColumn("score", F.lit(0.0))
            .limit(0)
        )

    if not live_paths or not include_terms:
        return empty()
    live_terms = sorted({w for p in live_paths for w in p} | set(phrase_terms))
    if any(w not in stats for w in live_terms):
        return empty()
    # an advisory term absent from the lexicon can match no document —
    # required-but-unranked semantics make the result empty up front
    if any(w not in stats for w in pq.advice):
        return empty()

    # ---- candidate generation: rarest term drives, per OR-path union ----
    # For the common single-path (pure AND) case this is one retain chain;
    # multi-path queries union per-path candidate sets (U1) then dedup (A6).
    positional = ranking is not None and ranking.positional
    flag_score = ranking is not None and ranking.flag_score
    penalties = ranking is not None and ranking.penalties
    weighted = ranking is not None and ranking.weighted_counts
    need_pos = set(phrase_terms) | (set(live_terms) if positional else set())

    # role gate (in:system ...) → required flag mask per matched term
    gate_mask = 0
    for g in pq.gates:
        if g not in ROLE_FLAG:
            raise ValueError(f"unknown role gate 'in:{g}'")
        gate_mask |= ROLE_FLAG[g]
    # a gate within the priority flags runs entirely on the (much smaller)
    # priority tier: every gate-passing (doc, term) occurrence is flagged,
    # hence present there (two-tier head, CombinedIndexReader.java:152-176)
    prio_ok = (
        gate_mask != 0
        and (gate_mask & ~PRIORITY_FLAGS) == 0
        and reader.prio is not None
    )

    def term_df(
        word: str, candidates: np.ndarray | None, is_driver: bool = False
    ) -> DataFrame:
        tid = stats[word][0]
        # min_tf_norm cuts apply to EVERY term's scan (block-max pruning on
        # each leg of an intersection, SkipListReader.java:87 tryRetainData
        # + block max); top/first-block budgets stay driver-only
        out = reader.decode_term(
            tid,
            candidates=candidates,
            with_positions=word in need_pos,
            with_wtf=weighted,
            min_tf_norm=(_driver_min_tf_norm or {}).get(word),
            top_blocks=_driver_top_blocks if is_driver else None,
            first_blocks=budget_blocks if is_driver else None,
            tier="prio" if (prio_ok and word not in need_pos) else "full",
            lang=lang,
        )
        cols = [F.col("doc_id"), F.col("tf").alias(f"tf_{_safe(word)}")]
        if weighted:
            cols.append(F.col("wtf_q4").alias(f"wtf_{_safe(word)}"))
        if gate_mask or flag_score:
            cols.append(F.col("flags").alias(f"flags_{_safe(word)}"))
        if word in need_pos:
            cols.append(F.col("positions").alias(f"pos_{_safe(word)}"))
        return out.select(*cols)

    # conv: restrictions (F5 doc-range analogue): resolve conversation ids
    # to doc ids via the forward index (tiny driver probe) and seed the
    # driver term's decode with them — blocks outside the doc-id windows
    # are skipped undecoded (ReverseIndexRetainDocumentRangeFilter)
    conv_doc_ids: np.ndarray | None = None
    if pq.convs:
        conv_doc_ids = np.sort(
            _collect_ids_u64(
                reader.doc_stats.filter(F.col("conv_id").isin(pq.convs)).select(
                    "doc_id"
                )
            )
        )
        if conv_doc_ids.size == 0:
            return empty()

    # set:<name> search sets (RankingSearchSet membership): members resolve
    # to doc ids through the forward index and seed the decode like conv:
    # ranges (the reference holds the set in RAM, so the driver-side id
    # array honors the same size contract); a missing/empty set imposes no
    # constraint (contains() quirk). Oversized sets (beyond the candidate
    # cap) degrade to a distributed semi-join after the doc-stats join
    # instead of a driver collect.
    set_post_filters: list[DataFrame] = []
    for set_name in pq.sets:
        sdf = reader.search_set(set_name)
        if sdf is None:
            continue
        members = reader.doc_stats.join(
            F.broadcast(sdf), "conv_id", "left_semi"
        ).select("doc_id")
        # ONE job does both the size probe and the id fetch (a separate
        # count() would re-run the whole doc_stats semi-join): collect
        # cap+1 ids; more than cap rows back = oversized, degrade to the
        # distributed post-filter
        capped = _collect_ids_u64(members.limit(MAX_DRIVER_CANDIDATES + 1))
        if capped.size > MAX_DRIVER_CANDIDATES:
            set_post_filters.append(members)
            continue
        ids = np.sort(capped)
        if ids.size == 0:
            return empty()
        conv_doc_ids = (
            ids if conv_doc_ids is None else np.intersect1d(conv_doc_ids, ids)
        )
        if conv_doc_ids.size == 0:
            return empty()

    # the candidate-superset broadcast, if one is made during candidate
    # generation — reused to prune the exclusion / priority term decodes
    # below (those joins only care about docs already in the candidate set,
    # so a head-term ?priority word must not scan its full posting list)
    cand_bc = None

    def path_candidates(path_terms: list[str]) -> DataFrame:
        nonlocal cand_bc
        ordered = sorted(path_terms, key=lambda w: (stats[w][1], w))
        driver_word = ordered[0]
        cand = term_df(driver_word, conv_doc_ids, is_driver=True)
        cand_ids: np.ndarray | None = None
        # ship the driver's doc ids to the other terms' decode kernels only
        # when those terms' posting lists are big enough that block skipping
        # pays for the extra collect job (at small df a plain join is
        # cheaper; at head-term scale the pruning is the whole ballgame)
        rest_df = sum(stats[w][1] for w in ordered[1:])
        if (
            len(ordered) > 1
            and stats[driver_word][1] <= MAX_DRIVER_CANDIDATES
            and rest_df > PRUNE_DF_THRESHOLD
        ):
            arr = np.sort(_collect_ids_u64(cand.select("doc_id")))
            # a broadcast, not a closure capture: at the 2M-id cap this is
            # 16 MB shipped once per executor (torrent) instead of once per
            # task of every subsequent term scan
            cand_ids = reader.spark.sparkContext.broadcast(arr)
            cand_bc = cand_ids
        for word in ordered[1:]:
            cand = cand.join(term_df(word, cand_ids), "doc_id", "inner")
        return cand

    if len(live_paths) == 1:
        path_set = sorted(set(live_paths[0]) | need_pos)
        cand = path_candidates(path_set)
    else:
        # multi-path (OR): decode each DISTINCT term exactly once — a term
        # shared by several paths gets one postings scan, not one per path —
        # and fold everything through a single union + pivot aggregation
        # (one shuffle on doc_id replaces the per-path join chains plus the
        # old union+groupBy(max) dedup)
        #
        # candidate pruning: a doc matching path p contains p's rarest term,
        # so the union of per-path rarest-term doc ids is a superset of all
        # results — collected once (one job) and broadcast into every
        # distinct term's decode, which prunes the head terms' block scans
        # exactly as the single-path retain chain does
        cand_ids = None
        drivers = sorted(
            {
                min(sorted(set(p) | need_pos), key=lambda w: (stats[w][1], w))
                for p in live_paths
            }
        )
        drv_df = sum(stats[w][1] for w in drivers)
        rest_df = sum(stats[w][1] for w in live_terms) - drv_df
        if drv_df <= MAX_DRIVER_CANDIDATES and rest_df > PRUNE_DF_THRESHOLD:
            id_frames = [
                reader.decode_term(
                    stats[w][0],
                    candidates=conv_doc_ids,
                    tier="prio" if (prio_ok and w not in need_pos) else "full",
                    lang=lang,
                ).select("doc_id")
                for w in drivers
            ]
            ids = reduce(lambda a, b: a.unionByName(b), id_frames)
            arr = np.unique(_collect_ids_u64(ids))
            cand_ids = reader.spark.sparkContext.broadcast(arr)
            cand_bc = cand_ids
        elif conv_doc_ids is not None:
            cand_ids = reader.spark.sparkContext.broadcast(conv_doc_ids)
            cand_bc = cand_ids
        frames = []
        for i, w in enumerate(live_terms):
            tdf = reader.decode_term(
                stats[w][0],
                candidates=cand_ids,
                with_positions=w in need_pos,
                with_wtf=weighted,
                min_tf_norm=(_driver_min_tf_norm or {}).get(w),
                top_blocks=_driver_top_blocks,
                tier="prio" if (prio_ok and w not in need_pos) else "full",
                lang=lang,
            )
            sel = [
                F.col("doc_id"),
                F.lit(i).alias("ti"),
                F.col("tf"),
                (F.col("wtf_q4") if weighted else F.lit(None).cast("int")).alias(
                    "wtf_q4"
                ),
                F.col("flags"),
                (
                    F.col("positions")
                    if w in need_pos
                    else F.lit(None).cast("array<int>")
                ).alias("positions"),
            ]
            frames.append(tdf.select(*sel))
        allt = reduce(lambda a, b: a.unionByName(b), frames)
        aggs = []
        for i, w in enumerate(live_terms):
            tfi = F.when(F.col("ti") == i, F.col("tf"))
            aggs.append(F.max(tfi).alias(f"tf_{_safe(w)}"))
            if weighted:
                aggs.append(
                    F.max(F.when(F.col("ti") == i, F.col("wtf_q4"))).alias(
                        f"wtf_{_safe(w)}"
                    )
                )
            if gate_mask or flag_score:
                aggs.append(
                    F.max(F.when(F.col("ti") == i, F.col("flags"))).alias(
                        f"flags_{_safe(w)}"
                    )
                )
            if w in need_pos:
                aggs.append(
                    F.max(F.when(F.col("ti") == i, F.col("positions"))).alias(
                        f"pos_{_safe(w)}"
                    )
                )
        cand = allt.groupBy("doc_id").agg(*aggs)
        # retain docs where at least one path matched in full (mirrors the
        # old per-path inner-join chains: need_pos terms are mandatory)
        def _path_present(p: list[str]) -> F.Column:
            return reduce(
                lambda a, w: a & F.col(f"tf_{_safe(w)}").isNotNull(),
                sorted(set(p) | need_pos),
                F.lit(True),
            )

        cand = cand.filter(
            reduce(lambda a, p: a | _path_present(p), live_paths, F.lit(False))
        )

    # ---- role gate (F8): every matched include term must carry the flags ----
    if gate_mask:
        for w in live_terms:
            fc = F.col(f"flags_{_safe(w)}")
            cand = cand.filter(
                fc.isNull()
                | (fc.bitwiseAND(F.lit(gate_mask)) == F.lit(gate_mask))
            )

    # ---- exclusion: anti-join (ReverseIndexRejectFilter) ----
    # the anti/left joins below only care about docs already in the
    # candidate set, so a head-term exclusion/priority word prunes its
    # decode against the candidate-superset broadcast instead of scanning
    # the full posting list (tryRejectData's skip-list walk is likewise
    # driven by the candidate buffer, SkipListReader.java:248)
    def _lazy_cand_bc():
        """Build the candidate broadcast on demand when candidate
        generation didn't need one (e.g. a single small include term) but
        a big exclusion/priority term would scan unpruned without it."""
        nonlocal cand_bc
        if cand_bc is None:
            drivers = {
                min(sorted(set(p) | need_pos), key=lambda w: (stats[w][1], w))
                for p in live_paths
            }
            if sum(stats[w][1] for w in drivers) <= MAX_DRIVER_CANDIDATES:
                frames = [
                    reader.decode_term(
                        stats[w][0], candidates=conv_doc_ids, lang=lang
                    ).select("doc_id")
                    for w in sorted(drivers)
                ]
                arr = np.unique(
                    _collect_ids_u64(
                        reduce(lambda a, b: a.unionByName(b), frames)
                    )
                )
                cand_bc = reader.spark.sparkContext.broadcast(arr)
        return cand_bc

    for word in pq.exclude:
        if word in stats:
            prune = (
                _lazy_cand_bc()
                if stats[word][1] > PRUNE_DF_THRESHOLD
                else cand_bc
            )
            cand = cand.join(
                reader.decode_term(
                    stats[word][0], candidates=prune, lang=lang
                ).select("doc_id"),
                "doc_id",
                "left_anti",
            )

    # ---- advisory terms: semi-join retain (AdviceTerm — required to
    # match, excluded from ranking; QueryParser.java:25, the advice terms
    # become retain filters but never enter the compiled score). Same
    # candidate-pruned decode as exclusions: a head advice term skips
    # blocks outside the candidate superset instead of scanning unpruned.
    for word in pq.advice:
        prune = (
            _lazy_cand_bc()
            if stats[word][1] > PRUNE_DF_THRESHOLD
            else cand_bc
        )
        cand = cand.join(
            reader.decode_term(
                stats[word][0], candidates=prune, lang=lang
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )

    # ---- phrase constraints ----
    for ph in pq.phrases:
        cand = _phrase_filter(cand, ph)

    # ---- doc metadata join + spec limits (ParamMatchingQueryFilter) ----
    cand = cand.join(reader.doc_stats, "doc_id")
    for members in set_post_filters:
        # corpus-scale search set: plain (shuffling) semi-join — correct at
        # any set size; the common dimension-sized case was already folded
        # into the decode seed above
        cand = cand.join(members, "doc_id", "left_semi")
    if reader.tombstones is not None:
        # deleted docs are masked in BOTH WAND phases (each runs through
        # here), so the phase-1 θ never counts a tombstoned doc — the cut
        # stays sound after deletions
        cand = cand.join(F.broadcast(reader.tombstones), "doc_id", "left_anti")
    if blocklist is not None and safe_tier >= 1:
        # tiered safety blocklist (NsfwDomainFilter.isBlocked, nsfw-filter/
        # .../domain/NsfwDomainFilter.java:64-74): filter level t blocks
        # every list row with tier <= t; 0 disables. Applied at the same
        # point as tombstones so both WAND phases mask identically and the
        # phase-1 θ never counts a blocked doc. The list is a vertex-sized
        # dim (the reference syncs ~10^4 rows from NSFW_DOMAINS hourly) —
        # broadcast anti-join, no shuffle of the candidate side.
        blocked = blocklist.where(F.col("tier") <= F.lit(safe_tier)).select(
            "doc_id"
        )
        cand = cand.join(F.broadcast(blocked), "doc_id", "left_anti")
    if lang is not None:
        cand = cand.filter(F.col("lang") == lang)
    if pq.convs_exclude:
        cand = cand.filter(~F.col("conv_id").isin(pq.convs_exclude))
    op_map = {">": "__gt__", "<": "__lt__", "=": "__eq__", ">=": "__ge__", "<=": "__le__"}
    for lim in pq.limits:
        # 'rank' filters on the quality bucket in the doc id's high bits —
        # the reference's RankTerm specification limit over the domain rank
        # (QueryFactory.java:151; ParamMatchingQueryFilter)
        col = {
            "turns": F.col("n_turns"),
            "len": F.col("doc_len"),
            "rank": F.shiftrightunsigned(F.col("doc_id"), 57),
            # YearTerm specification limit (QueryParser.java:229-231) over
            # the year stamped into doc stats at build time
            "year": F.col("year"),
        }[lim.field]
        cand = cand.filter(getattr(col, op_map[lim.op])(F.lit(lim.value)))

    # ---- scoring: per-term partials, max-over-paths of sum-along-path ----
    def partial_col(word: str):
        df_w = float(stats[word][1])
        if weighted:
            c = F.coalesce(
                F.col(f"wtf_{_safe(word)}").cast("double") / 4.0, F.lit(0.0)
            )
        else:
            c = F.coalesce(F.col(f"tf_{_safe(word)}").cast("double"), F.lit(0.0))
        return bm25_partial(
            c,
            F.col("doc_len").cast("double"),
            F.lit(df_w),
            n_corpus,
        )

    def flag_partial_col(word: str):
        df_w = float(stats[word][1])
        return flags_partial(
            F.coalesce(F.col(f"flags_{_safe(word)}"), F.lit(0)),
            F.lit(df_w),
            n_corpus,
        )

    path_sums = []
    for p in live_paths:
        terms_in_path = sorted(set(p))
        s = reduce(
            lambda a, w: a + partial_col(w), terms_in_path, F.lit(0.0)
        )
        if flag_score:
            # score_bFlags: the same max-over-paths aggregate over the
            # flag-derived pseudo-counts, at half the BM25 weight
            # (IndexResultRankingService.java:139-141)
            s = s + FLAG_BM25_WEIGHT * reduce(
                lambda a, w: a + flag_partial_col(w), terms_in_path, F.lit(0.0)
            )
        # a path only counts if every term matched (tf present)
        present = reduce(
            lambda a, w: a & F.col(f"tf_{_safe(w)}").isNotNull(), terms_in_path, F.lit(True)
        )
        path_sums.append(F.when(present, s).otherwise(F.lit(None)))
    raw = path_sums[0] if len(path_sums) == 1 else F.greatest(*path_sums)

    # ---- positional bonuses (first-position, verbatim, proximity — §5) ----
    if positional:
        # the "full group" = include terms in query appearance order
        ordered = [w for w in pq.ordered_include_terms() if w in stats]
        pos_of = {w: F.col(f"pos_{_safe(w)}") for w in ordered}
        first_pos = F.greatest(
            *[
                F.coalesce(F.element_at(pos_of[w], 1), F.lit(1))
                for w in ordered
            ],
            F.lit(1),
        )
        bonuses = first_position_bonus(first_pos)
        if len(ordered) >= 2:
            base = pos_of[ordered[0]]
            adj_cond = lambda p: reduce(  # noqa: E731
                lambda acc, i: acc
                & F.array_contains(pos_of[ordered[i]], p + i),
                range(1, len(ordered)),
                F.lit(True),
            )
            all_present = reduce(
                lambda a, w: a & pos_of[w].isNotNull(), ordered, F.lit(True)
            )
            phrase_cnt = F.when(
                all_present, F.size(F.filter(base, adj_cond))
            ).otherwise(F.lit(0))
            bonuses = bonuses + verbatim_bonus(phrase_cnt, len(ordered))
        if len(ordered) > 2:
            # NB: a two-arg lambda would be treated by F.transform as
            # (element, index) — build single-arg closures per term offset
            def _shift(i: int):
                return lambda p: p - F.lit(i)

            adjusted = F.array(
                *[
                    F.transform(pos_of[w], _shift(i))
                    for i, w in enumerate(ordered)
                ]
            )
            bonuses = bonuses + proximity_bonus(
                _min_spread_udf(adjusted), len(ordered)
            )
        # optional phrase-constraint groups (expansion segments): in-order
        # matches of the group's ORIGINAL words boost the score, scaled by
        # the group's share of the full query (reference optional-group
        # verbatim scoring; the mandatory groups are pq.phrases above)
        full_size = max(len(ordered), 1)
        for grp in pq.opt_phrases:
            # a group is scoreable only when EVERY word has decoded
            # positions (pos_<w> columns exist for need_pos terms only —
            # a lexicon word on no live path has no column and would make
            # the whole query fail to resolve)
            if (
                len(grp) < 2
                or not set(grp) <= need_pos
                or any(w not in stats for w in grp)
            ):
                continue
            gpos = {w: F.col(f"pos_{_safe(w)}") for w in grp}
            gbase = gpos[grp[0]]

            def _adj(words_):
                return lambda p: reduce(
                    lambda acc, i: acc
                    & F.array_contains(gpos[words_[i]], p + i),
                    range(1, len(words_)),
                    F.lit(True),
                )

            gpresent = reduce(
                lambda a, w: a & gpos[w].isNotNull(), grp, F.lit(True)
            )
            gcnt = F.when(
                gpresent, F.size(F.filter(gbase, _adj(grp)))
            ).otherwise(F.lit(0))
            bonuses = bonuses + optional_group_bonus(gcnt, len(grp), full_size)
        raw = raw + bonuses

    # priority terms: score bonus when present (reference multiplies by
    # exp(priorityTermAdjustment/5); our transcript analogue gives each
    # matched priority term a 1/5 exponent step)
    prio_present = [w for w in pq.priority if w in stats]
    if prio_present:
        for w in prio_present:
            prune = (
                _lazy_cand_bc()
                if stats[w][1] > PRUNE_DF_THRESHOLD
                else cand_bc
            )
            cand = cand.join(
                reader.decode_term(stats[w][0], candidates=prune, lang=lang)
                .select("doc_id", F.lit(1).alias(f"prio_{_safe(w)}")),
                "doc_id",
                "left",
            )
        n_prio = reduce(
            lambda a, w: a
            + F.when(F.col(f"prio_{_safe(w)}").isNotNull(), 1.0).otherwise(0.0),
            prio_present,
            F.lit(0.0),
        )
        raw = raw * F.exp(n_prio / 5.0)

    t_bias = ranking.temporal_bias if ranking is not None else None
    if penalties and t_bias is None:
        # rank bucket lives in the doc id's high bits (ids.py layout)
        rank_col = F.shiftrightunsigned(F.col("doc_id"), 57)
        pen = document_penalty(F.col("doc_len").cast("double"), rank_col)
        scored = cand.withColumn("score", normalize(raw, pen))
    elif t_bias is not None:
        # the temporal term joins the same document-bonus sum the other
        # penalties live in (calculateDocumentBonus, then -min(0, bonus))
        if t_bias not in ("recent", "old"):
            raise ValueError(f"unknown temporal_bias {t_bias!r}")
        lo, hi = reader.year_range
        anchor = hi if t_bias == "recent" else lo
        from ..functions.scoring import document_bonus, temporal_bias

        bonus = temporal_bias(
            F.col("year"), anchor, ranking.temporal_bias_weight
        )
        if penalties:
            rank_col = F.shiftrightunsigned(F.col("doc_id"), 57)
            bonus = (
                document_bonus(F.col("doc_len").cast("double"), rank_col)
                + bonus
            )
        scored = cand.withColumn(
            "score", normalize(raw, -F.least(F.lit(0.0), bonus))
        )
    else:
        scored = cand.withColumn("score", normalize(raw))
    if round_score_to is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), round_score_to))

    # ---- per-group cap + global top-k (ascending: lower = better) ----
    tb = F.col("doc_id") if tie_break is None else tie_break
    if group_cap is not None:
        w = Window.partitionBy(group_col).orderBy(F.col("score").asc(), tb)
        scored = scored.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= group_cap
        ).drop("_rn")
    return (
        scored.orderBy(F.col("score").asc(), tb)
        .limit(k)
        .select("doc_id", "conv_id", "doc_len", "n_turns", "score")
    )


def keyword_positions(
    reader: IndexReader, results: DataFrame, terms: list[str]
) -> DataFrame:
    """Per-result keyword report: for each top-k result and query term,
    the term's first position and tf in that document — the reference
    decorates every search result with its keywords' scores/positions
    (DecoratedSearchResultItem.keywordScores, built from the same postings
    values the ranker consumed,
    code/index/java/nu/marginalia/index/results/IndexResultScoreCalculator
    .java keyword extraction).

    ``results`` is a run_query output (carries ``conv_id``). The top-k set
    is tiny, so its ids collect to the driver and prune each term's decode
    to the candidate blocks (the J5 candidate→values lookup); absent
    (doc, term) combinations produce no row, matching the reference's
    absent-keyword mask.
    """
    convs = [r["conv_id"] for r in results.select("conv_id").collect()]
    ds = reader.doc_stats.filter(F.col("conv_id").isin(convs)).select(
        "doc_id", "conv_id"
    )
    # decode_blocks' candidate contract: sorted uint64 (rank-stamped ids
    # can exceed int63, and the membership mask binary-searches)
    ids = np.sort(
        np.array([r["doc_id"] for r in ds.collect()], dtype=np.int64).astype(
            np.uint64
        )
    )
    stats = reader.term_stats(terms)
    outs = []
    for w in sorted(set(terms)):
        if w not in stats or not len(ids):
            continue
        dec = reader.decode_term(stats[w][0], candidates=ids, with_positions=True)
        outs.append(
            dec.select(
                "doc_id",
                F.lit(w).alias("term"),
                # runs are encoded ascending, so element 1 IS the first hit
                F.element_at("positions", 1).cast("long").alias("first_pos"),
                "tf",
            )
        )
    if not outs:
        return reader.spark.createDataFrame(
            [], "conv_id string, term string, first_pos long, tf long"
        )
    out = reduce(lambda a, b: a.unionByName(b), outs)
    return out.join(F.broadcast(ds), "doc_id").select(
        "conv_id", "term", "first_pos", "tf"
    )


def explain_scores(
    reader: IndexReader,
    query: str | ParsedQuery,
    k: int = 10,
    round_to: int = 6,
    **kw,
) -> DataFrame:
    """Per-result ranking-factor report — the reference's
    ``debugRankingFactors`` surface (``IndexResultRankingService`` records
    ``termScore.bm25`` per term plus the document bonus components;
    served through ``QueryDebugInterface``): the top-k results with one
    ``bm25_<term>`` column per include term (that term's BM25 partial in
    that document, rounded) alongside the final score.

    The top-k set is tiny, so its ids collect to the driver and prune
    each term's decode to candidate blocks (same J5 lookup as
    ``keyword_positions``); an absent (doc, term) pair explains as 0.0,
    matching a term that contributed nothing.
    """
    from ..functions.scoring import bm25_partial

    pq = parse_query(query) if isinstance(query, str) else query
    res = run_query(reader, pq, k=k, **kw)
    lang = kw.get("lang") or pq.lang
    terms = sorted(set(pq.all_include_terms()))
    stats = reader.term_stats(terms, lang=lang)
    n_corpus = (
        reader.lang_doc_counts.get(lang, 0.0)
        if lang is not None
        else reader.n_docs
    )
    ids = np.sort(
        np.array(
            [r["doc_id"] for r in res.select("doc_id").collect()],
            dtype=np.int64,
        ).astype(np.uint64)
    )
    out = res
    for w in terms:
        # readable factor column for plain words, hash-safe otherwise
        col = f"bm25_{w}" if w.isalnum() else f"bm25_{_safe(w)}"
        if w not in stats or not len(ids):
            out = out.withColumn(col, F.lit(0.0))
            continue
        dec = reader.decode_term(
            stats[w][0], candidates=ids, lang=lang
        ).select("doc_id", F.col("tf").alias(f"_tf_{_safe(w)}"))
        out = out.join(F.broadcast(dec), "doc_id", "left")
        partial = bm25_partial(
            F.coalesce(F.col(f"_tf_{_safe(w)}").cast("double"), F.lit(0.0)),
            F.col("doc_len").cast("double"),
            F.lit(float(stats[w][1])),
            n_corpus,
        )
        out = out.withColumn(
            col,
            F.round(
                F.when(F.col(f"_tf_{_safe(w)}").isNull(), 0.0).otherwise(
                    partial
                ),
                round_to,
            ),
        ).drop(f"_tf_{_safe(w)}")
    return out


def decorate_results(
    results: DataFrame, transcripts: DataFrame, n_turns: int = 1
) -> DataFrame:
    """Join top-k results back to the source transcripts for display — the
    reference's document-DB decoration join (docId → url/title/description,
    ``IndexQueryExecution.java:189-207``), carrying the same metadata its
    ``DecoratedSearchResultItem`` does: description (here: the first
    ``n_turns`` turns' text + opening role), ``pubYear`` (year of the first
    turn, the build's doc-year semantics), ``dataHash`` (a 60-bit content
    hash over the full conversation text), and ``wordsTotal`` (the indexed
    doc length, already on the result row).

    The (tiny) result set is broadcast into the transcript scan, so the
    big table is touched once with a semi-join — never the other way
    round; all decoration fields come out of ONE aggregation over the
    matched conversations.
    """
    hits = transcripts.join(
        F.broadcast(results.select("conv_id")), "conv_id", "left_semi"
    )
    full_sorted = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    snippets = hits.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("turn_idx") < n_turns,
                            F.struct("turn_idx", "text"),
                        )
                    )
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("snippet"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.year(F.min("ts")).alias("pub_year"),
        F.conv(
            F.substring(
                F.md5(
                    F.array_join(
                        F.transform(full_sorted, lambda s: s["text"]), "\n"
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("data_hash"),
    )
    out = results.join(F.broadcast(snippets), "conv_id", "left")
    if "doc_len" in results.columns:
        out = out.withColumn("words_total", F.col("doc_len").cast("long"))
    return out


def run_query_wand(
    reader: IndexReader,
    query: str | ParsedQuery,
    k: int = 10,
    **kw,
) -> DataFrame:
    """Two-phase block-max top-k (the north-star's block-max WAND,
    re-expressed for a batch engine) — EXACT same results as ``run_query``:

    - **phase 1** runs the normal pipeline with the term's postings
      restricted to its highest-``max_tf_norm`` blocks, yielding k valid
      result scores. The kth of them is a *lower bound* θ on the true kth
      best raw score (it is the kth best of a subset of the true candidate
      set, with every exclusion/limit filter applied).
    - **phase 2** re-runs the full pipeline with the scan predicate
      ``max_tf_norm >= θ / idf`` pushed to the postings parquet scan — any
      block whose score upper bound ``idf * max_tf_norm`` cannot reach θ is
      skipped via row-group column stats, undecoded. A doc only in skipped
      blocks has raw < θ ≤ true-kth-raw, so it cannot enter the top k.

    Eligible shapes: ANY include tree — single term, pure OR, pure AND,
    and mixed AND-of-OR (``( a | b ) c``, the expansion engine's default
    output shape). No phrases / priority / positional ranking / group cap;
    exclusions and spec limits are fine — both phases apply them
    identically.

    The general per-term cut (every enumerated OR-path's retain chain gets
    block-max skipping in the reference, ``CombinedIndexReader.java:86-203``
    + ``SkipListReader.java:87``): with ``UB_t = idf_t * global max
    tf-norm`` (term_bounds table) and ``UB(p) = Σ_{t∈p} UB_t``, a block of
    term t can hold a top-k doc only if SOME path p ∋ t could reach θ
    through it::

        idf_t * block_max_tf_norm >= θ - max_{p ∋ t} (UB(p) - UB_t)

    so the scan cut is ``max_tf_norm >= (θ - max_residual_t) / idf_t``.
    Soundness: if a doc's block is pruned on term t, then EVERY path
    containing t sums below θ for that doc; a doc whose true best path
    reaches θ therefore keeps that path un-pruned and scores exactly, and
    the multi-path pipeline's max-over-surviving-paths is its true score.
    Pure OR reduces to ``θ / idf_t`` (residual 0), pure AND to the single
    path's ``θ - Σ_{u≠t} UB_u`` — the previous special cases.

    When the caller rounds scores (``round_score_to``), θ is inverted from
    the kth score widened by half a rounding quantum — a doc just below
    the unrounded kth can round into a tie and win the deterministic
    tie-break, so the cut must keep it.

    Ineligible queries fall back to the plain pipeline. At 10^12-turn
    scale this is the difference between scanning a head term's full
    posting list and touching a handful of blocks.
    """
    import math

    pq = parse_query(query) if isinstance(query, str) else query
    include = pq.all_include_terms()
    paths = pq.include.paths() if pq.include is not None else []
    eligible = (
        len(include) >= 1
        and bool(paths)
        and not pq.phrases
        and not pq.priority
        and kw.get("group_cap") is None
        and (
            kw.get("ranking") is None
            or not (
                kw["ranking"].positional
                or kw["ranking"].flag_score
                or kw["ranking"].penalties
                or kw["ranking"].weighted_counts
                or kw["ranking"].temporal_bias is not None
            )
        )
    )
    if not eligible:
        return run_query(reader, pq, k=k, **kw)
    # lang-scoped queries are eligible too: idf/θ use the language's own
    # stats (as the scorer does), while the per-term upper bounds stay the
    # GLOBAL block maxima — an upper bound for any language slice, so the
    # cut is merely conservative
    lang = kw.get("lang")
    if lang is None:
        lang = pq.lang  # `lang:xx` query syntax (run_query does the same)
    try:
        stats = reader.term_stats(include, lang=lang)
    except ValueError:  # pre-lang index
        return run_query(reader, pq, k=k, **kw)
    n_corpus = (
        reader.lang_doc_counts.get(lang, 0.0) if lang is not None else reader.n_docs
    )
    live_paths = [p for p in paths if all(w in stats for w in p)]
    live = sorted({w for p in live_paths for w in p})
    if not live or n_corpus <= 0:
        return run_query(reader, pq, k=k, **kw)
    pure_or = all(len(set(p)) == 1 for p in live_paths)

    def idf_of(w: str) -> float:
        df_w = float(stats[w][1])
        return math.log(1.0 + (n_corpus - df_w + 0.5) / (df_w + 0.5))

    idfs = {w: idf_of(w) for w in live}
    if any(v <= 0 for v in idfs.values()):
        return run_query(reader, pq, k=k, **kw)
    # phase 1 — threshold from each term's best blocks, budgeted from the
    # index's ACTUAL block geometry (an index built with small blocks needs
    # proportionally more of them to cover k candidates)
    n_blocks = max(1, -(-2 * k // reader.block_docs))
    kw1 = {**kw, "round_score_to": None}
    probe = run_query(
        reader, pq, k=k, _driver_top_blocks=n_blocks, **kw1
    ).collect()
    if len(probe) < k:
        return run_query(reader, pq, k=k, **kw)  # tiny list: no cut possible
    kth_score = probe[-1]["score"]
    round_to = kw.get("round_score_to")
    if round_to is not None:
        # widen to the worst score that could still round-tie with the kth
        kth_score = round(kth_score, round_to) + 0.5 * 10.0 ** (-round_to)
    # relative epsilon guards the float round-trip through normalize() —
    # pruning may only ever be conservative
    theta_raw = (501.0 / (kth_score * kth_score) - 1.0) * (1.0 - 1e-9)
    if pure_or:  # includes the single-term case (residual would equal θ)
        cuts = {w: theta_raw / idfs[w] for w in live}
    else:
        bounds = reader.term_bounds([stats[w][0] for w in live])
        if any(stats[w][0] not in bounds for w in live):
            return run_query(reader, pq, k=k, **kw)
        ub = {w: idfs[w] * bounds[stats[w][0]] for w in live}
        ub_path = [sum(ub[w] for w in set(p)) for p in live_paths]
        cuts = {}
        for w in live:
            # the most forgiving path containing w sets its residual
            max_resid = max(
                ub_p - ub[w]
                for p, ub_p in zip(live_paths, ub_path)
                if w in p
            )
            residual = theta_raw - max_resid
            if residual > 0:
                cuts[w] = residual / idfs[w]
        if not cuts:
            return run_query(reader, pq, k=k, **kw)  # no pruning possible
    return run_query(reader, pq, k=k, _driver_min_tf_norm=cuts, **kw)


def run_query_page(
    reader: IndexReader,
    query: str | ParsedQuery,
    page: int = 1,
    page_size: int = 10,
    total_limit: int = 100,
    use_wand: bool = False,
    **kw,
) -> DataFrame:
    """Result pagination — the reference's ``IndexClient.executeQueries``
    slice (`code/index/api/java/nu/marginalia/index/api/IndexClient.java:
    167-175`): gather the ranked top ``total_limit`` (the query's
    ``resultsTotal`` budget), then return rows ``[(page−1)·page_size,
    …+page_size)`` of it; a page past the end is empty, page ≤ 1 starts
    at 0 (the reference's ``Math.max(0, …)``).

    Spark shape: the gather is the usual ``TakeOrderedAndProject``; the
    slice is ``GlobalLimit``+``Offset`` over the already-``total_limit``-
    sized relation — no extra shuffle, and deeper pages reuse the same
    plan (pass ``use_wand=True`` to let block-max pruning serve the
    gather for eligible shapes)."""
    runner = run_query_wand if use_wand else run_query
    res = runner(reader, query, k=total_limit, **kw)
    start = max(0, (page - 1) * page_size)
    return res.offset(start).limit(page_size)


def run_search(
    reader: IndexReader,
    query: str | ParsedQuery,
    k: int = 10,
    **kw,
) -> DataFrame:
    """Strategy-dispatching entry point — honors the query's ``qs=``
    execution-strategy override (``QueryParser.java:238`` QsTerm →
    ``QueryFactory.java:246-258`` parseQueryStrategy; the index applies a
    non-AUTO strategy via ``setQueryStrategy``, QueryFactory.java:214).

    Mapping (documented divergence: the reference's SENTENCE/TOPIC pick a
    positional-vs-topic scan; our two physical strategies are the plain
    decode pipeline and block-max WAND, which return EXACT-equal results):

    - ``qs=sentence`` / ``qs=plain`` → :func:`run_query`
    - ``qs=topic`` / ``qs=wand`` → :func:`run_query_wand` (falls back to
      the plain pipeline for shapes WAND can't prune, same results)
    - ``qs=rf_<role>`` → folded into the role gate by the parser
      (REQUIRE_FIELD_* analogue) — strategy stays AUTO
    - anything else → AUTO = plain pipeline (reference default)
    """
    pq = parse_query(query) if isinstance(query, str) else query
    if pq.strategy == "wand":
        return run_query_wand(reader, pq, k=k, **kw)
    return run_query(reader, pq, k=k, **kw)
