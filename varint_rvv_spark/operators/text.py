"""Text-analysis operators for training-data pipelines.

Pure JVM-side column expressions (regex + string built-ins): language
ID by stopword-marker scoring, quality-score features, token counting
(whitespace and BPE-ish regex), and document fingerprinting.  All
deterministic and DuckDB-oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker words per language — tiny stopword profiles for the n-gram/
# stopword heuristic; chosen to be ASCII-regex-safe in both engines
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "que", "una", "por"],
    "pt": ["o", "os", "uma", "não", "para"],
    "ru": ["и", "в", "не", "это", "что"],
}

# BPE-ish token regex: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_hits(col, words) -> F.Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(1)))


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word hits.

    Ties / zero hits → 'other'.  greatest()+chained when keeps it all
    JVM-side; a production profile would use char-n-gram models via a
    pandas UDF, but the dispatch pattern is identical.
    """
    hits = {lang: _marker_hits(F.col(text_col), words)
            for lang, words in LANG_MARKERS.items()}
    df2 = df
    for lang, h in hits.items():
        df2 = df2.withColumn(f"_h_{lang}", h)
    best = F.greatest(*[F.col(f"_h_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("other"))
    for lang in LANG_MARKERS:  # first-wins on ties, fixed dict order
        pred = pred.when(F.col(f"_h_{lang}") == best, F.lit(lang))
    df2 = df2.withColumn(out_col, pred.otherwise(F.lit("other")))
    return df2.drop(*[f"_h_{lang}" for lang in LANG_MARKERS])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-score features: lengths, token stats, symbol ratios."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-zÀ-ÿа-яА-Я]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    safe = F.greatest(n_chars, F.lit(1))
    return (df
            .withColumn("n_chars_txt", n_chars)
            .withColumn("n_tokens", n_tokens)
            .withColumn("avg_token_len",
                        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4))
            .withColumn("alpha_ratio", F.round(n_alpha / safe, 4))
            .withColumn("digit_ratio", F.round(n_digit / safe, 4))
            .withColumn("punct_ratio", F.round(n_punct / safe, 4)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar [0,1] quality score from the features (simple web-text
    heuristic: long-enough, mostly alphabetic, sane token lengths)."""
    df2 = quality_features(df, text_col)
    len_ok = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    alpha_ok = F.col("alpha_ratio")
    tok_ok = F.when((F.col("avg_token_len") >= 3)
                    & (F.col("avg_token_len") <= 12), 1.0).otherwise(0.5)
    return df2.withColumn(
        "quality", F.round(0.4 * len_ok + 0.4 * alpha_ok + 0.2 * tok_ok, 4))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish-regex token counts (both JVM-side)."""
    t = F.col(text_col)
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), F.lit(0)))
    return (df.withColumn("ws_tokens", ws)
            .withColumn("bpe_tokens", bpe))


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Normalized content fingerprint: md5 of lower+whitespace-collapsed
    text — the cross-run document identity key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(F.encode(norm, "utf-8")))


def _rep_counts_kernel(k: int):
    """mapInArrow kernel: (id, token-array) batches → per-doc
    (id, n_words, best, dup) gram-repetition counts.

    Replaces the in-row sort_array + run-length `aggregate` lambda
    (higher-order functions are CodegenFallback — interpreted per
    element) with C-speed vector passes: k shifted takes +
    binary_join_element_wise build the gram strings, dictionary_encode
    gives exact string-equality integer codes (no hashing — collisions
    impossible by construction), and one np.unique over
    (doc, code) keys yields the per-doc gram counts.  best = max
    count, dup = Σ counts>1 — the same definitions the lambda
    computed, byte-exact (asserted against the expression form in
    tests)."""
    import pyarrow as pa

    def fn(batch_iter):
        import numpy as np
        import pyarrow.compute as pc

        for batch in batch_iter:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0)
            toks = batch.column(1)
            off_dt = (np.int64 if pa.types.is_large_list(toks.type)
                      else np.int32)
            # absolute offsets into toks.values (the raw child array —
            # flatten() re-bases/compacts around nulls and would break
            # absolute indexing)
            offs = np.frombuffer(toks.buffers()[1], dtype=off_dt)[
                toks.offset: toks.offset + n + 1].astype(np.int64)
            counts = np.diff(offs)
            if toks.null_count:
                valid = toks.is_valid().to_numpy(zero_copy_only=False)
                gcounts = np.where(valid,
                                   np.maximum(counts - (k - 1), 0), 0)
            else:
                valid = None
                gcounts = np.maximum(counts - (k - 1), 0)
            values = toks.values
            best = np.zeros(n, dtype=np.int64)
            dup = np.zeros(n, dtype=np.int64)
            total_g = int(gcounts.sum())
            if total_g:
                g_ends = np.cumsum(gcounts)
                doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                    gcounts)
                within = (np.arange(total_g, dtype=np.int64)
                          - np.repeat(g_ends - gcounts, gcounts))
                gstart = np.repeat(offs[:-1], gcounts) + within
                parts = [values.take(pa.array(gstart + j))
                         for j in range(k)]
                gram = pc.binary_join_element_wise(*parts, " ")
                codes = pc.dictionary_encode(gram)
                idx = codes.indices.to_numpy().astype(np.int64)
                ndict = len(codes.dictionary)
                key = doc_idx * np.int64(ndict) + idx
                uk, cnt = np.unique(key, return_counts=True)
                udoc = uk // np.int64(ndict)
                seg = np.flatnonzero(
                    np.r_[True, udoc[1:] != udoc[:-1]])
                seg_doc = udoc[seg]
                best[seg_doc] = np.maximum.reduceat(cnt, seg)
                dup[seg_doc] = np.add.reduceat(
                    np.where(cnt > 1, cnt, 0), seg)
            n_words = pa.array(counts, type=pa.int64(),
                               mask=None if valid is None else ~valid)
            yield pa.RecordBatch.from_arrays(
                [ids, n_words,
                 pa.array(best, type=pa.int64()),
                 pa.array(dup, type=pa.int64())],
                names=[batch.schema.names[0], "n_words", "best", "dup"])

    return fn


def repetition_stats(df: DataFrame, id_col: str,
                     text_col: str = "text", k: int = 2,
                     keep_input: bool = False) -> DataFrame:
    """Gopher/MassiveText-style repetition quality stats (public
    rules, Rae et al. 2021 §A1.1): per document, the fraction of
    words covered by the single most frequent word k-gram and by ALL
    duplicated k-grams.  High values flag boilerplate / keyword-stuff
    pages that survive exact and near dedup.

    100 TB shape: ZERO shuffle.  Per-doc gram counting would
    classically explode + groupBy(doc, gram) — a corpus-sized
    exchange; both forms below are a single map over the scan:

    * keep_input=False (default, the metrics-table form): an Arrow
      kernel over (id, tokens) batches — gram build + exact
      dictionary-encode counting in vectorized pyarrow/numpy
      (_rep_counts_kernel); only the id and token arrays cross the
      Python boundary.  Measured ~2x the expression form (r6): the
      sort+aggregate higher-order functions are CodegenFallback and
      evaluate interpreted per element.
    * keep_input=True (the pipeline-filter form, every input column
      kept): pure JVM expressions — the gram array is sorted IN the
      row (sort_array) and counted by a run-length `aggregate` lambda
      (equal grams are adjacent after the sort).  Shipping arbitrary
      input columns through an Arrow kernel would cost more than the
      interpreted lambda saves.

    Definitions (mirrored exactly by the DuckDB oracle):
      n_words            size of the whitespace token array
      top_kgram_frac     min(1, k·max_gram_count / n_words)
      dup_kgram_frac     min(1, k·Σ{count>1} count / n_words)
    Documents with fewer than k words have zero grams → both
    fractions 0.  Rounded to 5 decimals.  `keep_input=True`
    keeps every input column alongside the metrics (the
    pipeline-filter form — still zero shuffle).
    """
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"),
                    F.lit(0).alias("dup"))

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        dup = F.when(~same & (acc["run"] > 1),
                     acc["dup"] + acc["run"]).otherwise(acc["dup"])
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"),
                        dup.alias("dup"))

    def fin(acc):
        return F.struct(
            acc["best"].alias("best"),
            F.when(acc["run"] > 1, acc["dup"] + acc["run"])
            .otherwise(acc["dup"]).alias("dup"))

    from ..functions import tokens
    from .dedup import word_gram_expr

    if not keep_input:
        src = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        id_type = src.schema[id_col].dataType.simpleString()
        counted = src.mapInArrow(
            _rep_counts_kernel(k),
            f"{id_col} {id_type}, n_words long, best long, dup long")
        nw = F.col("n_words")
        fr = (lambda c: F.round(
            F.least(F.lit(1.0), F.lit(float(k)) * c / nw), 5))
        return counted.select(
            F.col(id_col), nw.alias("n_words"),
            fr(F.col("best")).alias(f"top_{k}gram_frac"),
            fr(F.col("dup")).alias(f"dup_{k}gram_frac"))

    # capture-free gram chain (word_gram_expr — callers of the
    # keep_input form filter on the OUTPUT metrics, and pushed
    # predicates substitute into lambda bodies, so no element_at
    # lambda may reference the token expression here).
    # sort_array, not array_sort: array_sort's default comparator is a
    # lambdafunction evaluated interpreted per comparison; sort_array
    # uses the native type ordering (measured 4.40 -> 3.33 s on the
    # sf1.0 sort+count sub-plan).  Identical order: grams are never
    # null (concat over non-null tokens), so the null-placement
    # difference between the two cannot surface.
    grams = F.sort_array(word_gram_expr(text_col, k))
    st = F.aggregate(grams, init, step, fin)
    n_words = F.size(tokens(text_col))
    frac = (lambda c: F.round(
        F.least(F.lit(1.0), F.lit(float(k)) * c / n_words), 5))
    metrics = [n_words.cast("long").alias("n_words"),
               frac(F.col("_st.best")).alias(f"top_{k}gram_frac"),
               frac(F.col("_st.dup")).alias(f"dup_{k}gram_frac")]
    base = [F.col(c) for c in df.columns] if keep_input \
        else [F.col(id_col)]
    return df.withColumn("_st", st).select(*base, *metrics)


TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref|ref_src)="


def canonical_url(col) -> F.Column:
    """Canonical form of a web URL — the join/dedup key of every
    crawl pipeline's first stage (standard normalization, public
    practice): lowercase host, strip a leading `www.`, drop the
    scheme and fragment, strip trailing slashes from the path, drop
    tracking query params (utm_*/gclid/fbclid/...), and sort the
    surviving params so equivalent URLs collide byte-identically.

    Pure JVM expressions (try_parse_url + array ops — ANSI mode's parse_url raises on malformed input) — usable as a
    map-side key at any scale.  A URL with no host (malformed)
    canonicalizes to NULL so it never joins."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    host = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("HOST"))), r"^www\.", "")
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
        r"/+$", "")
    query = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.when(F.size(kept) > 0,
                F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    return F.when(host.isNull() | (F.length(host) == 0), F.lit(None)) \
        .otherwise(F.concat(host, path, qs))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Keep one row per canonical URL (lowest `id_col` wins —
    deterministic).  One shuffle on the canonical key; rows whose URL
    fails to canonicalize (NULL key) are all kept, matching the
    convention that malformed keys never merge."""
    c = canonical_url(url_col)
    keyed = df.withColumn("_curl", c)
    wins = (keyed.filter(F.col("_curl").isNotNull())
            .groupBy("_curl").agg(F.min(id_col).alias(id_col)))
    kept = keyed.join(wins, ["_curl", id_col], "left_semi")
    return kept.unionByName(keyed.filter(F.col("_curl").isNull())) \
        .drop("_curl")
