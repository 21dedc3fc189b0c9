"""Training-example augmentation transforms.

Fill-in-the-middle (FIM) splitting (Bavarian et al. 2022, "Efficient
Training of Language Models to Fill in the Middle"): a deterministic
fraction of documents is split at two random token positions into
(prefix, middle, suffix) so the data loader can emit PSM/SPM-ordered
training sequences; the rest pass through untouched. Everything is
md5-derived from the document id, so the split is replay-stable and has a
bit-exact DuckDB oracle — the md5-uniform/md5-nibble discipline of
operators/sampling and sources/derive.

At 100 TB: a pure codegen projection — zero shuffle, zero UDF; composes
map-side with tokenize/pack stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS
from .sampling import md5_uniform


def _md5_mod(id_col: Column, tag: str, modulus: Column) -> Column:
    """Deterministic non-negative integer in [0, modulus) from the id —
    first 15 md5 hex chars (60 bits, < 2^63) mod the column modulus.
    Non-negative pmod == DuckDB % — exact cross-engine."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f"|{tag}")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), modulus)


def fim_split(
    docs: DataFrame,
    fim_rate: float = 0.5,
    salt: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FIM document splitting: with probability ``fim_rate`` (md5-uniform
    on id — deterministic, replay-stable) cut the token sequence at two
    md5-derived positions ``lo <= hi`` and emit (prefix, middle, suffix);
    otherwise the whole document rides in ``prefix`` with empty
    middle/suffix (``fim = false``). Documents with fewer than 2 tokens
    are never split.

    Token-level contract: pieces are space-joined lowercase-preserving
    whitespace tokens, so ``prefix || ' ' || middle || ' ' || suffix``
    reconstructs the WHITESPACE-NORMALIZED document (the same
    normalization every tokenize stage here applies), not raw bytes.

    Cut points: ``c = H(id|fim{salt}|{a,b}) % (n_tokens+1)`` —
    non-negative 60-bit md5 ints mod (n+1), lo/hi by min/max, so both cut
    distributions are uniform over token boundaries including the ends.

    Scale shape: one codegen projection, zero shuffle.

    Output: (id_col, fim, n_tokens, prefix, middle, suffix).
    """
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("tk"))
    n = F.size(F.col("tk")).cast("long")
    u = md5_uniform(F.col(id_col), salt)
    c1 = _md5_mod(F.col(id_col), f"fim{salt}|a", n + 1)
    c2 = _md5_mod(F.col(id_col), f"fim{salt}|b", n + 1)
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")
    do_fim = (u < F.lit(float(fim_rate))) & (n >= 2)
    join = lambda arr: F.array_join(arr, " ")
    full = join(F.col("tk"))
    prefix = F.when(do_fim, join(F.slice(F.col("tk"), 1, lo))).otherwise(full)
    middle = F.when(do_fim, join(F.slice(F.col("tk"), lo + 1, hi - lo))).otherwise(
        F.lit("")
    )
    suffix = F.when(
        do_fim, join(F.slice(F.col("tk"), hi + 1, F.size(F.col("tk")) - hi))
    ).otherwise(F.lit(""))
    return base.select(
        F.col(id_col),
        do_fim.alias("fim"),
        n.alias("n_tokens"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
    )


def ict_pairs(
    docs: DataFrame,
    span_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverse-Cloze-Task pairs (Lee et al. 2019, ORQA §3.1): the
    self-supervised retrieval pretext — ``query`` = one
    ``span_tokens``-token group of the document picked deterministically
    (60-bit md5 of the id mod the group count, replay/retry-stable), and
    ``context`` = the document with that group removed. Documents with
    fewer than two groups emit nothing (no non-empty context exists).

    Groups tile the token stream: group g covers tokens
    [g·span+1, (g+1)·span] 1-based, the last group possibly short —
    the same tiling as the q133 chat-turn synthesis.

    Scale shape: one codegen projection, zero shuffle (the FIM contract).

    Output: (id_col, n_tokens, n_groups, pick, query, context).
    """
    s = int(span_tokens)
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("tk"))
    n = F.size(F.col("tk")).cast("long")
    n_groups = F.expr(f"(size(tk) + {s} - 1) DIV {s}").cast("long")
    pick = _md5_mod(F.col(id_col), f"ict{s}", n_groups)
    q = F.slice(F.col("tk"), (pick * s + 1).cast("int"), s)
    tail_len = F.greatest(n - (pick * s + s), F.lit(0).cast("long"))
    ctx = F.concat(
        F.slice(F.col("tk"), 1, (pick * s).cast("int")),
        F.slice(
            F.col("tk"), (pick * s + s + 1).cast("int"), tail_len.cast("int")
        ),
    )
    return (
        base.where(n_groups >= 2)
        .select(
            F.col(id_col),
            n.alias("n_tokens"),
            n_groups.alias("n_groups"),
            pick.alias("pick"),
            F.array_join(q, " ").alias("query"),
            F.array_join(ctx, " ").alias("context"),
        )
    )


def span_corruption(
    docs: DataFrame,
    tile_tokens: int = 20,
    span_tokens: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5/UL2 span-corruption example builder (Raffel et al. 2020 §3.1.4,
    Tay et al. 2022 UL2 R-denoiser): mask one ``span_tokens``-token span
    per ``tile_tokens``-token tile — noise density span/tile (the T5
    default 15% at 3/20) — emitting ``inputs`` (spans replaced by
    ``<extra_id_g>`` sentinels in place) and ``targets`` (each sentinel
    followed by the tokens it hid).

    Spans never overlap BY CONSTRUCTION: tile g owns tokens
    [g·T+1, (g+1)·T] (1-based) and its span starts at a 60-bit-md5
    offset in [0, T−L] — the q136 group-tiling idiom, so placement is
    deterministic, replay/retry-stable, and cross-engine exact (no
    greedy overlap resolution to replicate). The ragged tail past the
    last full tile stays unmasked; docs shorter than one tile pass
    through whole (n_spans = 0, empty targets) — the FIM passthrough
    contract.

    Scale shape: ONE whole-stage-codegen projection, zero shuffle, one
    md5 per tile (~n_tokens/T per doc).

    Output: (id_col, n_tokens, n_spans, n_masked, inputs, targets).
    """
    T, L = int(tile_tokens), int(span_tokens)
    if not (0 < L < T):
        raise ValueError("need 0 < span_tokens < tile_tokens")
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("tk")).select(
        F.col(id_col),
        "tk",
        F.expr(f"size(tk) DIV {T}").cast("long").alias("_nt"),
    )
    off = (
        f"pmod(cast(conv(substring(md5(concat(cast({id_col} as string),"
        f" '|sc{L}|', cast(g142 as string))), 1, 15), 16, 10) as bigint),"
        f" {T - L + 1})"
    )
    spans = (
        "transform(CASE WHEN _nt >= 1 THEN sequence(0L, _nt - 1)"
        " ELSE array() END,"
        f" g142 -> named_struct('g', g142, 'o', {off}))"
    )
    sent = "concat('<extra_id_', cast(s142.g as string), '>')"
    inputs_arr = (
        "concat(flatten(transform(_sp, s142 -> concat("
        f" slice(tk, cast(s142.g * {T} + 1 as int), cast(s142.o as int)),"
        f" array({sent}),"
        f" slice(tk, cast(s142.g * {T} + s142.o + {L} + 1 as int),"
        f"       cast({T} - s142.o - {L} as int))))),"
        f" slice(tk, cast(_nt * {T} + 1 as int),"
        f"       cast(size(tk) - _nt * {T} as int)))"
    )
    targets_arr = (
        "flatten(transform(_sp, s142 -> concat("
        f" array({sent}),"
        f" slice(tk, cast(s142.g * {T} + s142.o + 1 as int), {L}))))"
    )
    return (
        base.withColumn("_sp", F.expr(spans))
        .select(
            F.col(id_col),
            F.size("tk").cast("long").alias("n_tokens"),
            F.col("_nt").alias("n_spans"),
            (F.col("_nt") * L).cast("long").alias("n_masked"),
            F.array_join(F.expr(inputs_arr), " ").alias("inputs"),
            F.array_join(F.expr(targets_arr), " ").alias("targets"),
        )
    )


# Shared engine/oracle constant (oracle-literal technique): the q152 SQL
# builder interpolates these EXACT strings — single-line ASCII, no quotes,
# rendered as prefix || head || suffix so neither engine parses a
# placeholder. Never fork.
INSTRUCTION_TEMPLATES = (
    ("Summarize the following document: ", " Summary:"),
    ("Read the passage and continue it. Passage: ", " Continuation:"),
    ("Answer using only the context. Context: ", " Answer:"),
    ("Rewrite the text in simpler words. Text: ", " Rewrite:"),
)


def template_expand(
    docs: DataFrame,
    n_head: int = 30,
    n_target: int = 20,
    salt: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FLAN-style instruction-template expansion (Wei 2022, "Finetuned
    Language Models Are Zero-Shot Learners" §2.1: each example rendered
    through one of several natural-language instruction templates):
    every document gets ONE md5-chosen template (deterministic,
    replay-stable — the fim/ict tag discipline), its first ``n_head``
    tokens rendered into the template as the model input, and the next
    ``n_target`` tokens as the supervision target.

    Scale shape: one codegen projection — the template table is a
    CASE/WHEN over :data:`INSTRUCTION_TEMPLATES` literals, the head and
    target are array slices; zero shuffle, zero UDF, rides any scan that
    already reads ``text``. Short documents degrade gracefully: an empty
    slice renders as an empty string (never NULL).

    Output: (id_col, tpl_id, n_tokens, input, target).
    """
    from ..functions.text import WS_CLASS

    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    d = docs.select(F.col(id_col), toks.alias("tk"))
    tpl = _md5_mod(
        F.col(id_col), f"tpl{int(salt)}", F.lit(len(INSTRUCTION_TEMPLATES))
    )
    head = F.array_join(F.slice("tk", 1, int(n_head)), " ")
    target = F.array_join(
        F.slice("tk", int(n_head) + 1, int(n_target)), " "
    )
    rendered = None
    for i, (pre, suf) in enumerate(INSTRUCTION_TEMPLATES):
        branch = F.concat(F.lit(pre), head, F.lit(suf))
        rendered = (
            F.when(F.col("tpl_id") == i, branch)
            if rendered is None
            else rendered.when(F.col("tpl_id") == i, branch)
        )
    return (
        d.withColumn("tpl_id", tpl)
        .select(
            F.col(id_col),
            F.col("tpl_id"),
            F.size("tk").cast("long").alias("n_tokens"),
            rendered.otherwise(F.lit("")).alias("input"),
            target.alias("target"),
        )
    )
