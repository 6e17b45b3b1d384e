"""Text-cleaning operators for training-data pipelines: PII scrubbing,
sentence splitting, boilerplate-line stripping. All built-in JVM
expressions (regexp_replace / split / posexplode / broadcast anti-join)
— no Python in the hot path, every ratio-free output exactly
reproducible in any engine with the same regex semantics.

Regex dialect note: patterns here are restricted to the Java-regex /
RE2 common subset (no lookaround, no backreferences in the MATCH) so
the DuckDB oracles in poc_spark/contract.py run the very same pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-subset PII patterns. Deliberately simple and
# literal (like textstats.LANG_STOPWORDS) so the identical string embeds
# in the SQL oracle; swap for a curated ruleset in production — the
# Spark shape (sequential narrow regexp projections) is what matters.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}(-\d{2,4}){2,4}"

# ASCII record separator: a safe in-band sentence delimiter (RE2 has no
# lookbehind, so "split after terminator" is expressed as
# replace-with-sentinel + split — identical plan in both engines).
_SENT_SEP = "\x1e"  # chr(30)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_emails, n_ips, n_phones, clean_text) — count then redact
    emails / IPv4s / phone numbers with typed placeholders, the standard
    pre-training PII pass. Counts are measured on the ORIGINAL text;
    redaction applies email -> ip -> phone in that fixed order (the
    patterns are mutually non-overlapping by construction: '@' / dotted
    quad / leading '+').

    Scale shape: one narrow projection, no shuffle, no UDF — regexp
    runs in whole-stage codegen and pipelines with the parquet scan.
    """
    text = F.col(text_col)
    clean = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        clean.alias("clean_text"),
    )


def split_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sentence_id, sentence) — split on sentence terminators
    ([.!?] followed by whitespace), trim, drop empties. sentence_id is
    the pre-filter split position (stable, monotone per doc; gaps mark
    dropped empty segments).

    One narrow regexp projection + one explode — no shuffle; document
    order inside a partition is irrelevant because the id is computed
    per row."""
    marked = F.regexp_replace(F.col(text_col), r"([.!?])\s+", "$1" + _SENT_SEP)
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.split(marked, _SENT_SEP)).alias("sentence_id", "raw"),
    )
    sent = F.trim(F.col("raw"))
    return ex.select(
        F.col(id_col),
        F.col("sentence_id").cast("long"),
        sent.alias("sentence"),
    ).filter(F.length(sent) > 0)


def strip_boilerplate(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """(id, clean_text, n_removed) — remove every LINE that occurs in
    >= min_docs distinct documents (the classic corpus-level
    boilerplate filter: nav bars, cookie banners, footers). Documents
    whose every line is boilerplate survive with clean_text = ''.

    With `group_col` (r13) the threshold is SCOPED to that group — the
    CCNet rule, which shards line-dedup per site/domain: a line
    repeated across >= min_docs docs OF THE SAME site is boilerplate
    there, while the same line coincidentally spread across different
    sites survives everywhere. The frequency agg then keys
    (group, line), so its shuffle is skew-bounded by the largest site
    rather than by the global line domain.

    Scale shape: the boilerplate line set is USUALLY tiny (only lines
    repeated across >= min_docs docs survive the HAVING), so the
    removal join defaults to a broadcast LEFT ANTI — no shuffle of the
    corpus. But a pathological template-heavy crawl (most lines
    repeated across docs of a big site) can blow the broadcast budget,
    so the dispatch is ADAPTIVE (r13 finding #1): the HAVING survivors
    are localCheckpointed (they are needed twice anyway — once to
    count, once to join), and above
    `spark.poc.textclean.boilerBroadcastMaxRows` rows (default
    500 000 ≈ tens of MB of line text; 0 forces the scale side — the
    forced-all sweep exercises it) the anti-join falls back to a
    shuffled hash join keyed on the same (group, line) columns. The
    per-doc reassembly groups by id and sorts each doc's surviving
    (pos, line) structs in-memory (bounded by doc size, not corpus
    size). Line-frequency counting is one count-distinct aggregate
    shuffled by line — at 100 TB, cap candidate lines first with a
    length/frequency prefilter if the line domain explodes."""
    gcols = [group_col] if group_col else []
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in gcols],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy(*gcols, "line")
        .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select(*gcols, "line")
        .localCheckpoint(eager=True)
    )
    bcast_max = int(
        df.sparkSession.conf.get(
            "spark.poc.textclean.boilerBroadcastMaxRows", "500000"
        )
    )
    n_boiler = boiler.count()  # free: reads the checkpoint
    build = F.broadcast(boiler) if 0 < n_boiler <= bcast_max else boiler
    kept = lines.join(build, gcols + ["line"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_lines"))
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_clean"), F.lit("")).alias("clean_text"),
        (F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def normalize_unicode(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(<id_col>, text_norm, changed) — Unicode normalization (default
    NFC), the canonicalization every text pipeline runs before hashing
    or dedup: composed ('é') and decomposed ('e' + U+0301) spellings of
    the same grapheme otherwise hash differently and defeat exact
    dedup. Spark SQL has no normalization builtin, so this is one of
    the documented UDF-unavoidable cases: an Arrow-batched mapInPandas
    kernel over Python's unicodedata (UAX #15; DuckDB's utf8proc
    implementation agrees — the contract oracle pins cross-library
    equality). `changed` flags rows the normalization actually touched,
    so the common all-ASCII fast bulk can be routed around downstream.

    Scale fast path: pure-ASCII text is invariant under every Unicode
    normalization form, so ASCII rows (and NULLs) short-circuit as a
    JVM-only projection - only rows containing a non-ASCII byte ever
    cross the Arrow boundary. On a mostly-ASCII corpus that keeps the
    Python lane to a sliver of the scan; equality with the
    all-rows-through-Python shape is pinned in tests."""
    import pandas as pd
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    def gen(batches):
        for pdf in batches:
            src = pdf[text_col]
            norm = src.map(
                lambda s: None if s is None else unicodedata.normalize(form, s)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_norm": norm,
                    "changed": norm.ne(src) & src.notna(),
                }
            )

    # The id column passes through untouched in BOTH lanes: derive its
    # output name AND type from the input schema (a string id must
    # survive as a string — an earlier revision hardcoded `doc_id long`
    # and NULLed string ids on the fast path).
    id_type = df.schema[id_col].dataType.simpleString()
    base = df.select(F.col(id_col).alias(id_col), F.col(text_col))
    is_ascii = F.col(text_col).rlike(r"^[\x00-\x7F]*$")
    fast = base.filter(F.col(text_col).isNull() | is_ascii).select(
        F.col(id_col),
        F.col(text_col).alias("text_norm"),
        F.lit(False).alias("changed"),
    )
    slow = base.filter(F.col(text_col).isNotNull() & ~is_ascii).mapInPandas(
        gen, f"`{id_col}` {id_type}, text_norm string, changed boolean"
    )
    return fast.unionByName(slow)
