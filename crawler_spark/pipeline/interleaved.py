"""Operators over the interleaved text+media span payload.

The north rule's input shape (BASELINE.json input_hint) is an Iceberg table
of interleaved documents: ``(doc_id, spans:array<struct<kind:string,
text:string, media_ref:string, offset:int>>)`` — the same shape the crawl
engine lands (schemas.DOCUMENTS). These operators exercise that payload as
a first-class relation: deterministic synthesis from flat text (so the
DuckDB oracles can rebuild the identical table), interleave-invariant
checks, and rendering a document back to its training-order token stream.

Scale shapes: synthesis is explode + integer arithmetic (no join, no
window — offsets are CLOSED-FORM in the chunk ordinal, never a running
count); stats are one partial->final agg keyed on doc_id; render is one
agg with an order-by-offset string fold (collect_list + sort_array per
doc, bounded by doc size, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.pipeline.dedup import tokens_col


def synth_spans(documents: DataFrame, chunk: int = 5, media_every: int = 2) -> DataFrame:
    """Deterministic interleaved span table from flat text documents.

    Text is cut into non-overlapping ``chunk``-token text spans; after every
    ``media_every``-th text span a media span is interleaved whose
    ``media_ref`` is derived from (doc_id, media ordinal) — a stand-in for
    the image/video refs a real crawl parse emits (operators/parse.py).
    Offsets are the position in the final interleaved sequence, computed in
    closed form (text chunk ``i`` sits at ``i + i DIV media_every``; media
    ``j`` at ``(media_every+1)*j - 1``), so the whole table is one explode
    plus map-side arithmetic — no window, no shuffle beyond the explode.

    Returns the EXPLODED relation (doc_id, offset, kind, text, media_ref):
    flat columns so the driver's value-hash comparator applies; wrap with
    ``to_nested`` for the array<struct> form the engine's documents table
    uses.
    """
    m = media_every
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokens_col().alias("toks"),
    ).select(
        "doc_id",
        F.when(
            F.size("toks") > 0,
            F.expr(
                f"transform(sequence(0, (size(toks) - 1) DIV {chunk}),"
                f" i -> concat_ws(' ', slice(toks, i * {chunk} + 1, {chunk})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("chunks"),
    )
    text_spans = base.select(
        "doc_id", F.posexplode("chunks").alias("ci", "chunk")
    ).select(
        "doc_id",
        F.expr(f"ci + ci DIV {m}").cast("int").alias("offset"),
        F.lit("text").alias("kind"),
        F.col("chunk").alias("text"),
        F.lit("").alias("media_ref"),
    )
    media_spans = (
        base.filter(F.size("chunks") >= m)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, size(chunks) DIV {m})")).alias("j"),
        )
        .select(
            "doc_id",
            F.expr(f"({m} + 1) * j - 1").cast("int").alias("offset"),
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(F.lit("asset://"), F.col("doc_id"), F.lit("/"), F.col("j")).alias(
                "media_ref"
            ),
        )
    )
    return text_spans.unionByName(media_spans)


def to_nested(spans: DataFrame) -> DataFrame:
    """Fold the exploded span relation into the engine's documents shape
    (doc_id, spans:array<struct<kind,text,media_ref,offset>>), offset-ordered."""
    return (
        spans.groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(offset, kind, text, media_ref))),"
                " s -> struct(s.kind AS kind, s.text AS text,"
                " s.media_ref AS media_ref, s.offset AS offset))"
            ).alias("spans")
        )
    )


def interleave_stats(documents: DataFrame, chunk: int = 5, media_every: int = 2) -> DataFrame:
    """Per-document interleave invariants over the span table.

    ``offsets_ok`` asserts the contract the crawl engine's seq/span layer
    guarantees (SURVEY §7.3): offsets are dense 0..n-1 with no repeats —
    the property the byte-for-byte span-sequence equality gate relies on.
    One aggregation keyed on doc_id; every measure is exact integer/bool.
    """
    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    per = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0)).alias("n_text_spans"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media_spans"),
        F.sum(F.when(F.col("kind") == "text", F.length("text")).otherwise(0)).alias(
            "text_chars"
        ),
        F.max("offset").alias("max_offset"),
        F.countDistinct("offset").alias("n_offsets"),
    )
    out = (
        documents.select(F.col("doc_id").cast("string").alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_text_spans", F.lit(0)).cast("long").alias("n_text_spans"),
            F.coalesce("n_media_spans", F.lit(0)).cast("long").alias("n_media_spans"),
            F.coalesce("text_chars", F.lit(0)).cast("long").alias("text_chars"),
            (
                (
                    F.coalesce(F.col("max_offset") + 1, F.lit(0))
                    == F.coalesce("n_offsets", F.lit(0))
                )
                & (
                    F.coalesce("n_offsets", F.lit(0))
                    == F.coalesce("n_spans", F.lit(0))
                )
            ).alias("offsets_ok"),
        )
    )
    return out


def caption_pairs(documents: DataFrame, chunk: int = 5, media_every: int = 2) -> DataFrame:
    """Image-caption candidate mining over the interleaved payload.

    For every media span, pair it with the text spans immediately before and
    after it in offset order — the standard alignment heuristic multimodal
    training sets (image+caption pairs mined from interleaved web documents)
    are built from. Offsets are dense 0..n-1 (interleave_stats' ``offsets_ok``
    invariant), so adjacency in offset order IS adjacency in the document.

    Scale shape: ONE window partitioned by doc_id ordered by offset
    (lag/lead), then a filter — no self-join, no second shuffle. Window state
    is bounded by the largest single document, never the corpus. Guards keep
    it correct on arbitrary span tables too: a neighbor that is itself a
    media span (possible for media_every=1 or real crawled spans) yields ''.
    """
    from pyspark.sql import Window

    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    w = Window.partitionBy("doc_id").orderBy("offset")
    neighbor = spans.select(
        "doc_id",
        "offset",
        "kind",
        "media_ref",
        F.when(F.lag("kind").over(w) == "text", F.lag("text").over(w))
        .otherwise(F.lit(""))
        .alias("cap_before"),
        F.when(F.lead("kind").over(w) == "text", F.lead("text").over(w))
        .otherwise(F.lit(""))
        .alias("cap_after"),
    )
    return (
        neighbor.filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "offset",
            "media_ref",
            F.coalesce("cap_before", F.lit("")).alias("cap_before"),
            F.coalesce("cap_after", F.lit("")).alias("cap_after"),
        )
    )


def modality_mix(documents: DataFrame, chunk: int = 5, media_every: int = 2) -> DataFrame:
    """Per-language modality-mixture report: the knob a multimodal data mix
    is tuned with (how many text tokens ride along with each media asset).

    The span counts are CLOSED-FORM in the token count (n_chunks =
    (n_toks-1) DIV chunk + 1; n_media = n_chunks DIV media_every — the same
    arithmetic synth_spans materializes), so this never explodes spans at
    all: one narrow projection + one partial->final aggregation on lang.
    All measures exact integers; tokens-per-media is integer basis points.
    """
    per_doc = (
        documents.select(
            F.col("lang"),
            F.size(tokens_col()).cast("long").alias("n_toks"),
        )
        .withColumn(
            "n_chunks",
            F.expr(f"IF(n_toks > 0, (n_toks - 1) DIV {chunk} + 1, 0)"),
        )
        .withColumn("n_media", F.expr(f"n_chunks DIV {media_every}"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_media") > 0, 1).otherwise(0)).alias(
                "docs_with_media"
            ),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("n_media").cast("long").alias("total_media"),
        )
        .withColumn(
            "tokens_per_media_bp",
            F.expr(
                "IF(total_media > 0, (total_tokens * 10000) DIV total_media,"
                " CAST(0 AS BIGINT))"
            ),
        )
    )


def render_interleaved(documents: DataFrame, chunk: int = 5, media_every: int = 2) -> DataFrame:
    """Render each interleaved document to its training-order token stream.

    Media spans become ``<media:ref>`` placeholder tokens (the multimodal
    tokenizer hand-off point); the pieces are joined in offset order and
    fingerprinted. This is the export verb a multimodal packing stage
    consumes — the md5 keeps the driver comparison cheap while still
    pinning the exact byte sequence.
    """
    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    piece = F.when(F.col("kind") == "text", F.col("text")).otherwise(
        F.concat(F.lit("<media:"), F.col("media_ref"), F.lit(">"))
    )
    per = (
        spans.select("doc_id", "offset", "kind", piece.alias("piece"))
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(struct(offset, piece))),"
                        " s -> s.piece)"
                    ),
                    " ",
                )
            ).alias("render_fp"),
            F.count("*").alias("n_pieces"),
            F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media"),
        )
    )
    return (
        documents.select(F.col("doc_id").cast("string").alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("render_fp", F.md5(F.lit(""))).alias("render_fp"),
            F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce("n_media", F.lit(0)).cast("long").alias("n_media"),
        )
    )


def span_dedup(documents: DataFrame, chunk: int = 5, media_every: int = 2, min_df: int = 2) -> DataFrame:
    """Cross-document TEXT-SPAN dedup over the interleaved payload.

    The span-level analog of segment_dedup (textstats.py): a text span
    (nav bar, cookie banner, footer) repeated across documents is
    boilerplate inside the interleaved sequence — flagging it lets a
    packing stage drop the span while KEEPING the document's media and
    unique text (document-level dedup would throw the whole doc away).
    Returns one row per text span with the span's corpus document
    frequency and its drop verdict; media spans pass through untouched
    (df 0, never dropped) so the output still renders in offset order.

    Shape: one partial->final agg keyed on the span fingerprint (md5 of
    span text) + one broadcast-eligible join back on that key. Hot
    fingerprints (a banner in 10^8 docs) skew only the count row, not the
    join fan-out — each span row joins exactly one df row.
    """
    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    text_spans = spans.filter(F.col("kind") == "text").withColumn(
        "span_fp", F.md5("text")
    )
    dfreq = text_spans.groupBy("span_fp").agg(
        F.countDistinct("doc_id").alias("span_df")
    )
    flagged = text_spans.join(dfreq, "span_fp").select(
        "doc_id",
        "offset",
        "kind",
        "text",
        "media_ref",
        F.col("span_df").cast("long").alias("span_df"),
        (F.col("span_df") >= min_df).alias("drop_span"),
    )
    media = spans.filter(F.col("kind") == "media").select(
        "doc_id",
        "offset",
        "kind",
        "text",
        "media_ref",
        F.lit(0).cast("long").alias("span_df"),
        F.lit(False).alias("drop_span"),
    )
    return flagged.unionByName(media)


def span_lang_mix(
    documents: DataFrame, chunk: int = 5, media_every: int = 2
) -> DataFrame:
    """Per-document language mix over the interleaved TEXT spans.

    Interleaved training documents code-switch: a caption block in one
    language inside a body in another. Doc-level language ID (textstats.
    lang_id) averages that away; this operator predicts a language PER
    TEXT SPAN and aggregates the mix per document:

    - ``n_text_spans`` — text spans in the doc,
    - ``n_langs`` — distinct predicted span languages,
    - ``major_lang`` / ``major_cnt`` — plurality language (ties break to
      the lexicographically smallest, deterministic in both engines),
    - ``minority_bp`` — fraction of spans NOT in the plurality language,
      in integer basis points: the code-switching / contamination signal
      a curation pass thresholds.

    Scale shape: the span synthesis is one explode with closed-form
    offsets; the mix is two keyed aggregations (doc x lang, then doc) plus
    one row_number window PARTITIONED BY doc_id — every exchange keys on
    the document, so the plan parallelizes with the corpus.
    """
    from pyspark.sql import Window

    from crawler_spark.pipeline.textstats import lang_pred_col

    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    txt = spans.filter(F.col("kind") == "text").select(
        "doc_id", lang_pred_col("text").alias("span_lang")
    )
    counts = txt.groupBy("doc_id", "span_lang").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("span_lang"))
    major = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("span_lang").alias("major_lang"),
                F.col("cnt").alias("major_cnt"))
    )
    totals = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_text_spans"),
        F.count("*").cast("long").alias("n_langs"),
    )
    return totals.join(major, "doc_id").select(
        "doc_id",
        "n_text_spans",
        "n_langs",
        "major_lang",
        F.col("major_cnt").cast("long").alias("major_cnt"),
        F.expr(
            "CASE WHEN n_text_spans > 0 THEN"
            " (1000 * (n_text_spans - major_cnt)) DIV n_text_spans ELSE 0 END"
        ).cast("long").alias("minority_bp"),
    )


def pack_interleaved(
    documents: DataFrame,
    capacity: int = 2048,
    media_tokens: int = 64,
    chunk: int = 5,
    media_every: int = 2,
    bound: int | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing over the INTERLEAVED span stream.

    Multimodal training packs the span stream, not flat text: text spans
    cost their BPE-ish token count, media spans cost a FIXED visual-token
    budget (``media_tokens`` — the ViT patch allowance an image occupies
    in the sequence). Spans are laid out in (doc_id, offset) order and the
    stream splits every ``capacity`` tokens; each span reports its global
    ``start_off`` and the [first_bin, last_bin] range it occupies.

    Scale shape — identical to assemble.pack_sequences: the global prefix
    sum is two-level (arithmetic range-bucket on doc_id -> within-bucket
    cumulative window PARTITIONED BY bucket ordered by (doc_id, offset) ->
    per-bucket totals collected as P scalars and rebroadcast), never a
    single-partition global window. ``bound`` = inclusive max doc_id
    (catalog stats at warehouse scale; one columnar scan here).
    """
    spark = documents.sparkSession
    n = int(n_parts or spark.conf.get("spark.sql.shuffle.partitions"))
    bpe_pat = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    costed = spans.select(
        F.col("doc_id").cast("long").alias("_did"),
        "doc_id",
        "offset",
        "kind",
        F.when(
            F.col("kind") == "text",
            F.size(F.regexp_extract_all("text", F.lit(bpe_pat), F.lit(1))),
        )
        .otherwise(F.lit(int(media_tokens)))
        .cast("long")
        .alias("n_tok"),
    )
    if bound is None:
        bound = documents.agg(F.max("doc_id")).first()[0]
        if bound is None:
            bound = 0
    from pyspark.sql import Window

    bucket = F.least(
        F.lit(n - 1), F.floor(F.col("_did") * F.lit(n) / F.lit(int(bound) + 1))
    ).cast("long")
    w = Window.partitionBy("_bucket").orderBy("_did", "offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = (
        costed.withColumn("_bucket", bucket)
        .repartition(n, "_bucket")
        .withColumn("_cum", F.sum("n_tok").over(w))
    )
    local = local.cache()
    sizes = {
        int(r["_bucket"]): int(r["_tot"])
        for r in local.groupBy("_bucket").agg(F.sum("n_tok").alias("_tot")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(sizes):
        offsets.append((b, acc))
        acc += sizes[b]
    if not offsets:
        offsets = [(0, 0)]
    off_df = F.broadcast(spark.createDataFrame(offsets, "_bucket long, _off long"))
    cap = int(capacity)
    return (
        local.join(off_df, "_bucket")
        .withColumn("start_off", F.col("_off") + F.col("_cum") - F.col("n_tok"))
        .withColumn("first_bin", F.expr(f"start_off DIV {cap}"))
        .withColumn(
            "last_bin",
            F.when(
                F.col("n_tok") > 0, F.expr(f"(start_off + n_tok - 1) DIV {cap}")
            ).otherwise(F.expr(f"start_off DIV {cap}")),
        )
        .select("doc_id", "offset", "kind", "n_tok", "start_off", "first_bin", "last_bin")
    )


def media_dedup(documents: DataFrame, pool: int = 16, chunk: int = 5,
                media_every: int = 2) -> DataFrame:
    """Content-hash dedup of media assets across the interleaved corpus.

    Web media is massively duplicated (logos, tracking pixels, boilerplate
    imagery); training pipelines dedup assets by CONTENT hash before
    fetching/decoding, not by ref. The synthetic corpus has unique refs, so
    the content key is derived from the media ordinal modulo a ``pool``
    size — the deterministic stand-in for "many refs resolve to the same
    bytes" (the real key is decode_assets' payload sha1). Per content key:
    reference count, distinct-document count, and the canonical (minimum)
    ref the asset table keeps.

    Scale shape: one partial->final aggregation keyed on the content hash;
    count(DISTINCT doc_id) expands to the standard two-level exact
    distinct. No joins, no windows.
    """
    spans = synth_spans(documents, chunk=chunk, media_every=media_every)
    med = spans.filter(F.col("kind") == "media").select(
        "doc_id",
        "media_ref",
        # try_cast: the projection can be evaluated speculatively on rows
        # the kind filter later drops (text rows carry media_ref=''), and
        # ANSI cast of '' would throw there; media rows always match.
        F.md5(
            F.concat(
                F.lit("pool:"),
                F.expr(
                    f"try_cast(regexp_extract(media_ref, '/([0-9]+)$', 1)"
                    f" AS BIGINT) % {int(pool)}"
                ).cast("string"),
            )
        ).alias("content_key"),
    )
    return med.groupBy("content_key").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("media_ref").alias("canonical_ref"),
    )
