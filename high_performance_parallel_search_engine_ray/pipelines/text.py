"""Text-analysis pipelines over a (doc_id, text) Dataset (training-data ops).

All per-batch, no shuffles; quality metrics and token counts use the same
definitions the DuckDB oracle expresses (functions/textstats.py docs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import rolling_fingerprint
from ..functions.rounding import round_half_away


def _ratio(num, den) -> pa.Array:
    """num/den rounded 6dp, 0.0 where den == 0 (matches the scalar kernels
    and the oracle's CASE WHEN)."""
    import numpy as np

    n = np.asarray(num, dtype=np.float64)
    d = np.asarray(den, dtype=np.float64)
    out = np.divide(n, d, out=np.zeros_like(n), where=d != 0)
    return pa.array(round_half_away(out, 6), pa.float64())


def quality_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, n_ws_tokens, alpha_ratio, digit_ratio, punct_ratio)
    — pure pc kernels per batch (count_substring_regex for char classes and
    \\S+ token runs), no per-row Python. Definitions mirror
    functions/textstats.quality_score and the SQL oracle exactly."""

    def qbatch(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tok = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        alpha = pc.count_substring_regex(txt, "[A-Za-z]")
        digit = pc.count_substring_regex(txt, "[0-9]")
        punct = pc.count_substring_regex(txt, "[.,;:!?]")
        nc = n_chars.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_chars": n_chars,
                "n_ws_tokens": n_tok,
                "alpha_ratio": _ratio(alpha.to_numpy(zero_copy_only=False), nc),
                "digit_ratio": _ratio(digit.to_numpy(zero_copy_only=False), nc),
                "punct_ratio": _ratio(punct.to_numpy(zero_copy_only=False), nc),
            }
        )

    return docs.map_batches(qbatch, batch_format="pyarrow")


# RE2 alternation is leftmost-first like Python re, so this counts the same
# matches as functions/textstats._BPEISH_RE.findall (verified by the
# token_counts oracle + the vectorized/scalar differential test).
_BPEISH_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^\sa-zA-Z0-9]"


def token_count_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_ws_tokens, n_bpeish_tokens) — vectorized
    count_substring_regex over the batch (no per-row Python)."""

    def tbatch(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        return pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": pc.count_substring_regex(txt, r"\S+").cast(pa.int64()),
                "n_bpeish_tokens": pc.count_substring_regex(
                    txt, _BPEISH_PATTERN
                ).cast(pa.int64()),
            }
        )

    return docs.map_batches(tbatch, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language ID: profile value-sets built once per actor in
    __init__ (the stateful-stage pattern — reference analog: the
    lazily-loaded stopword list, `Serial Version/src/utils.c:9-31`);
    per-batch work is fully vectorized (regex word extraction + is_in per
    profile + bincount segment sums), matching functions/textstats.lang_id
    exactly (differential-tested)."""

    def __init__(self):
        import numpy as np

        from ..functions import textstats

        self._lang_id = textstats.lang_id  # scalar reference kernel
        # Arrow value-set per language, resident per actor
        self._profiles = [
            (lang, pa.array(sorted(words)))
            for lang, words in textstats._LANG_PROFILES.items()
        ]
        self._np = np

    def __call__(self, b: pa.Table) -> pa.Table:
        np = self._np
        n = b.num_rows
        # lang_id examines only the first 4000 chars (textstats contract);
        # word extraction = the scalar kernel's [a-zA-ZÀ-ÿ]+ runs (split on
        # the complement BEFORE lowercasing, exactly like findall+lower)
        head = pc.utf8_slice_codeunits(b["text"], 0, 4000)
        words = pc.split_pattern_regex(head, r"[^a-zA-ZÀ-ÿ]+")
        flat = pc.utf8_lower(pc.list_flatten(words))
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        flat = pc.filter(flat, nonempty)
        parents = parents[nonempty.to_numpy(zero_copy_only=False)]
        n_words = np.bincount(parents, minlength=n).astype(np.float64)
        best_hits = np.zeros(n, dtype=np.int64)
        best_lang = np.full(n, "und", dtype=object)
        for lang, vs in self._profiles:
            mask = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            hits = np.bincount(
                parents, weights=mask.astype(np.float64), minlength=n
            ).astype(np.int64)
            better = hits > best_hits  # strict: dict order = tie rule of
            best_lang[better] = lang   # the scalar kernel (insertion order)
            best_hits[better] = hits[better]
        score = np.divide(
            best_hits, n_words, out=np.zeros(n, dtype=np.float64),
            where=n_words > 0,
        )
        best_lang[best_hits == 0] = "und"
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang_pred": pa.array(list(best_lang), pa.string()),
                "lang_score": pa.array(round_half_away(score, 6), pa.float64()),
            }
        )


def lang_id_table(docs, concurrency: int = 2):
    return docs.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def fingerprint_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, fingerprint list<int64>) — winnowed rolling-hash doc
    fingerprints (functions/hashing.rolling_fingerprint)."""

    def fbatch(b: pa.Table) -> pa.Table:
        fps = [
            [x & 0x7FFFFFFFFFFFFFFF for x in rolling_fingerprint(t)]
            for t in b[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(fps, pa.list_(pa.int64()))}
        )

    return docs.map_batches(fbatch, batch_format="pyarrow")


def normalize_text_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, norm_text): lowercase, collapse whitespace runs to single
    spaces, strip ends — the standard curation normalization pass, pure pc
    kernels (SQL-mirrorable: trim(regexp_replace(lower(text),'\\s+',' ','g')))."""

    def nbatch(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b[text_col])
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({id_col: b[id_col], "norm_text": t})

    return docs.map_batches(nbatch, batch_format="pyarrow")


def stopword_ratios(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_ws_tokens, stopword_ratio): fraction of whitespace tokens
    that, lowercased and stripped of edge punctuation, are one of the five
    reference stopwords (functions/textstats._REF_STOPWORDS) — vectorized:
    split -> flatten -> lower+trim -> is_in -> bincount segment sums."""
    import numpy as np

    from ..functions.textstats import _REF_STOPWORDS

    stop_arr = pa.array(sorted(_REF_STOPWORDS))
    punct = ".,;:!?\"'()"

    def sbatch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        flat = pc.filter(flat, nonempty)
        parents = parents[nonempty.to_numpy(zero_copy_only=False)]
        n_tok = np.bincount(parents, minlength=n).astype(np.float64)
        stripped = pc.utf8_trim(pc.utf8_lower(flat), punct)
        hit = pc.is_in(stripped, value_set=stop_arr).to_numpy(zero_copy_only=False)
        stops = np.bincount(
            parents, weights=hit.astype(np.float64), minlength=n
        )
        t = pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "stopword_ratio": _ratio(stops, n_tok),
            }
        )
        # zero-token docs have no rows in the oracle's token GROUP BY
        return t.filter(pc.greater(t["n_ws_tokens"], 0))

    return docs.map_batches(sbatch, batch_format="pyarrow")


# -- PII scrubbing (training-data hygiene) -----------------------------------

# RE2 patterns (pyarrow and DuckDB both run RE2, so the oracle applies the
# SAME automaton). Email before phone: an email's digits must not be
# re-matched as a phone fragment after substitution.
_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PATTERN = r"\+?[0-9][0-9()\[\] .-]{6,}[0-9]"


def pii_scrub_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, scrubbed, n_emails, n_phones): emails -> <EMAIL>, phone-like
    digit runs -> <PHONE>, with per-doc match counts — the redaction pass a
    training-data pipeline runs before tokenization. Pure vectorized RE2
    kernels (count + global replace) per batch; no shuffle, no per-row
    Python."""

    def sbatch(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_em = pc.count_substring_regex(txt, _EMAIL_PATTERN).cast(pa.int64())
        t1 = pc.replace_substring_regex(txt, _EMAIL_PATTERN, "<EMAIL>")
        n_ph = pc.count_substring_regex(t1, _PHONE_PATTERN).cast(pa.int64())
        t2 = pc.replace_substring_regex(t1, _PHONE_PATTERN, "<PHONE>")
        return pa.table(
            {id_col: b[id_col], "scrubbed": t2, "n_emails": n_em, "n_phones": n_ph}
        )

    return docs.map_batches(sbatch, batch_format="pyarrow")


# -- repetition scoring (Gopher-style n-gram repetition gates) ---------------

def repetition_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_grams, top2gram_frac, dup2gram_frac): word-2-gram
    repetition metrics per document — the Gopher/MassiveText repetition
    gates a curation pipeline thresholds on (fraction of 2-gram
    occurrences taken by the most frequent 2-gram, and fraction of 2-gram
    occurrences that are repeats of an earlier one). Batch-local and
    shuffle-free: tokens -> adjacent-pair grams (numpy parent alignment)
    -> pandas hash-grouped counts per doc. Docs with <2 tokens emit no row
    (no 2-grams), matching the oracle's GROUP BY."""
    import numpy as np
    import pandas as pd

    def rbatch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        words = flat.to_pandas().to_numpy()[nonempty]
        parents = parents[nonempty]
        if len(words) < 2:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "n_grams": pa.array([], pa.int64()),
                    "top2gram_frac": pa.array([], pa.float64()),
                    "dup2gram_frac": pa.array([], pa.float64()),
                }
            )
        # adjacent pairs within the same doc
        same = parents[:-1] == parents[1:]
        gp = parents[:-1][same]
        grams = pd.Series(words[:-1][same]) + " " + pd.Series(words[1:][same])
        df = pd.DataFrame({"p": gp, "g": grams})
        per_gram = df.groupby(["p", "g"], sort=False).size()
        total = np.bincount(gp, minlength=n).astype(np.float64)
        top = per_gram.groupby(level=0).max()
        distinct = per_gram.groupby(level=0).size()
        top_a = np.zeros(n)
        dist_a = np.zeros(n)
        top_a[top.index.to_numpy()] = top.to_numpy(dtype=np.float64)
        dist_a[distinct.index.to_numpy()] = distinct.to_numpy(dtype=np.float64)
        has = total > 0
        t = pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.array(total.astype(np.int64), pa.int64()),
                "top2gram_frac": _ratio(top_a, total),
                "dup2gram_frac": _ratio(total - dist_a, total),
            }
        )
        return t.filter(pa.array(has))

    return docs.map_batches(rbatch, batch_format="pyarrow")


# -- unigram LM scoring (perplexity proxy) -----------------------------------

def unigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text",
                    max_model_terms: int | None = None):
    """(doc_id, n_tokens, avg_logprob): per-document mean log-probability
    under a unigram language model trained on the corpus itself — the
    cheap stand-in for the KenLM-style perplexity gate curation pipelines
    threshold on (low avg_logprob = unusual token distribution). Two
    passes:

      1. train: global term frequencies — per-batch Arrow counts, then the
         (term) groupby-sum shuffle; the resulting vocab-sized model is
         broadcast once via ray.put (bounded: vocabularies grow ~log of
         corpus size, millions of terms at 100 TB — a few hundred MB as
         sorted arrays, paid once per actor, never per batch);
      2. score: embarrassingly parallel — tokens -> searchsorted into the
         broadcast (term -> ln(freq/total)) arrays -> per-doc mean via
         bincount segment sums.

    Token definition = the engine's serial-tokenizer semantics
    (pipelines/index.tokenize_batch), so the DuckDB oracle reuses the
    shared toks CTE. Docs with zero kept tokens emit no row.

    ``max_model_terms`` bounds the model pull/broadcast to the top-V terms
    by count (ties term-asc; distributed sort+limit, so the driver never
    sees the full vocabulary); out-of-model tokens take the tail default
    logprob ln(1/total) — every dropped term has count <= the smallest
    kept count, so count=1 is the documented lower bound (tail tokens
    score as maximally rare; the gate degrades conservatively). ``total``
    stays the EXACT global token count in both modes. 100-TB setting:
    ~5-20M terms; None (the oracle contract) only when the vocabulary is
    known bounded — on open web text distinct-token counts reach billions
    (hashes, ids, mojibake)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from .index import tokenize_batch

    def counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        return t.group_by("term").aggregate([([], "count_all")]).rename_columns(
            ["term", "c"]
        )

    freq = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="cnt"))
        .materialize()
    )
    if max_model_terms is None:
        rows = freq.take_all()  # vocab-bounded pull (see docstring)
        total = float(sum(r["cnt"] for r in rows))
    else:
        rows = (
            freq.sort(["cnt", "term"], descending=[True, False])
            .limit(int(max_model_terms))
            .take_all()
        )
        total = float(freq.sum("cnt"))  # exact global count, small scalar
    terms = np.array([r["term"] for r in rows])
    cnts = np.array([r["cnt"] for r in rows], dtype=np.float64)
    order = np.argsort(terms)
    terms, cnts = terms[order], cnts[order]
    logp = np.log(cnts / total)  # same double division the SQL's LN does
    tail_lp = float(np.log(1.0 / total))  # assume-count-1 tail default
    model_ref = ray.put((terms, logp))

    def score(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        terms_s, logp_s = ray.get(model_ref)
        tok_terms = t["term"].to_numpy(zero_copy_only=False)
        if terms_s.size:
            idx = np.clip(np.searchsorted(terms_s, tok_terms), 0,
                          terms_s.size - 1)
            # unbounded mode: every token hits by construction; bounded
            # mode: misses take the tail default
            lp = np.where(terms_s[idx] == tok_terms, logp_s[idx], tail_lp)
        else:
            lp = np.full(len(tok_terms), tail_lp)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        n_tok = np.bincount(inv)
        sums = np.bincount(inv, weights=lp)
        return pa.table(
            {
                id_col: pa.array(uniq, b[id_col].type),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "avg_logprob": pa.array(
                    round_half_away(sums / n_tok, 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def quality_buckets(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """(doc_id, avg_logprob, bucket): the CCNet head/middle/tail quality
    split — an EXACT global ``ntile(k)`` over the ``unigram_logprob``
    score, ordered by (avg_logprob DESC, doc_id). Bucket 1 = head (highest
    mean log-prob / lowest perplexity proxy), bucket k = tail. Curation
    recipes keep the head and resample or drop the tail.

    Scale shape — the same two-pass range-partitioned global rank as
    ``pack_sequences``: only (doc_id, avg_logprob) rows ever shuffle.
      1. score table range-partitions by value (monotone in the DESC sort
         key, so partition p's ranks all precede partition p+1's);
      2. per-partition counts -> driver-side exclusive prefix over
         ``n_parts`` values -> broadcast bases;
      3. per-partition local sort + base = exact global rank; the ntile
         boundary arithmetic needs only the (driver-held) global count.
    Value-range partitioning can skew if the score distribution is highly
    concentrated; ``n_parts`` bounds the per-partition work and the score
    has ~continuous support, so this is the documented trade."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Max, Min

    lp = unigram_logprob(docs, id_col, text_col).materialize()
    b = lp.aggregate(Min("avg_logprob"), Max("avg_logprob"))
    if b is None or b["min(avg_logprob)"] is None:  # zero scored docs
        return lp.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "avg_logprob": t["avg_logprob"],
                    "bucket": pa.array(
                        np.zeros(t.num_rows, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    lo, hi = float(b["min(avg_logprob)"]), float(b["max(avg_logprob)"])
    span = (hi - lo) or 1.0

    def with_part(t: pa.Table) -> pa.Table:
        v = t["avg_logprob"].to_numpy(zero_copy_only=False)
        part = np.clip(
            ((hi - v) / span * n_parts).astype(np.int64), 0, n_parts - 1
        )
        return t.append_column("part", pa.array(part.astype(np.int32)))

    parted = lp.map_batches(with_part, batch_format="pyarrow").materialize()
    totals = {
        r["part"]: r["count()"]
        for r in parted.groupby("part").aggregate(Count()).take_all()
    }
    n = int(sum(totals.values()))
    base, bases = 0, {}
    for p in range(n_parts):
        bases[p] = base
        base += int(totals.get(p, 0))
    q, r = divmod(n, k)
    cut = r * (q + 1)
    bases_ref = ray.put(bases)

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        v = g["avg_logprob"].to_numpy()
        ids = g[id_col].to_numpy()
        idx = np.lexsort((ids, -v))
        rank = (
            np.arange(len(g), dtype=np.int64)
            + ray.get(bases_ref)[int(g["part"].iloc[0])]
        )
        bucket = (
            np.where(rank < cut, rank // (q + 1), r + (rank - cut) // max(q, 1))
            + 1
        )
        return pd.DataFrame(
            {
                id_col: ids[idx],
                "avg_logprob": v[idx],
                "bucket": bucket.astype(np.int64),
            }
        )

    return parted.groupby("part").map_groups(rank_part, batch_format="pandas")


def source_mix_epochs(
    docs,
    epochs: dict | None = None,
    default_epochs: int = 1,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """(doc_id, source, epoch): Dolma/LLaMA-style corpus mixing by integer
    repeat factor — every doc of source s is emitted ``epochs.get(s,
    default_epochs)`` times with epoch = 0..reps-1, the deterministic
    up-sampling step that weights high-quality sources before packing.
    Pure per-batch row replication (np.repeat over zero-copy Arrow takes);
    shuffle-free, reproducible across retries."""
    import numpy as np

    eps = epochs or {}

    def rep(b: pa.Table) -> pa.Table:
        import pandas as pd

        src = b[source_col].to_numpy(zero_copy_only=False)
        reps = (
            pd.Series(src).map(eps).fillna(default_epochs).to_numpy(np.int64)
        )
        idx = np.repeat(np.arange(len(src)), reps)
        offs = np.cumsum(reps) - reps
        epoch = np.arange(int(reps.sum()), dtype=np.int64) - offs[idx]
        take = pa.array(idx)
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(take),
                source_col: b[source_col].combine_chunks().take(take),
                "epoch": pa.array(epoch, pa.int64()),
            }
        )

    return docs.map_batches(rep, batch_format="pyarrow")


def temperature_rates(
    docs,
    alpha: float = 0.5,
    mod: int = 100,
    source_col: str = "source",
):
    """(source, n_docs, rate): T5/mT5-style temperature sampling rates.
    With per-source share p_s, temperature-adjusted weights are
    p_s^alpha (alpha<1 flattens the mix toward rare sources); sampling
    cannot up-replicate, so rates normalize against the rarest source:
    rate_s = floor(mod * (n_min / n_s)^(1-alpha)) — the rarest source
    keeps everything, head sources get downsampled toward the tempered
    share. Pass the result to `stratified_sample` (or use
    `temperature_mix`, which composes the two). Two-pass and exactly
    reproducible: the count pass shuffles only (source, n) rows; the
    number of sources is corpus-metadata-scale, so the rate table is
    computed driver-side (same bounded-dimension policy as
    `source_quality_stats`). alpha=0.5 keeps the rate formula inside
    SQRT so the DuckDB oracle reproduces the identical IEEE doubles."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([source_col]).group_by([source_col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([source_col, "n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Sum("n", alias_name="n_docs"))
    )
    rows = agg.take_all()  # bounded: one row per source
    srcs = [r[source_col] for r in rows]
    n = np.array([r["n_docs"] for r in rows], dtype=np.float64)
    # (n_min / n_s)^(1-alpha); kept as the literal expression so the SQL
    # mirror (POWER / SQRT on doubles) computes bit-identical values
    rate = np.floor(mod * (n.min() / n) ** (1.0 - alpha)).astype(np.int64)
    return pa.table(
        {
            source_col: pa.array(srcs, pa.string()),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
            "rate": pa.array(rate, pa.int64()),
        }
    )


def temperature_mix(
    docs,
    alpha: float = 0.5,
    mod: int = 100,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Temperature-rebalanced corpus: `temperature_rates` (two-pass count →
    driver-side rate table) composed with the deterministic
    `stratified_sample` keep predicate ``id % mod < rate_s``. The corpus
    streams through the filter exactly once; only (source, n) rows ever
    shuffle; retries/resumes reselect the identical rows."""
    rt = temperature_rates(docs, alpha=alpha, mod=mod, source_col=source_col)
    rates = {
        s: int(r)
        for s, r in zip(rt[source_col].to_pylist(), rt["rate"].to_pylist())
    }
    return stratified_sample(
        docs, rates=rates, mod=mod, id_col=id_col, source_col=source_col
    )


# -- decontamination (benchmark n-gram overlap) -------------------------------

def _word_ngrams(b: pa.Table, n: int, text_col: str) -> tuple:
    """(parents, gram_series) of word-n-grams for a batch — the shared
    gram kernel of `decontaminate` and `decontaminate_bloom`."""
    import numpy as np
    import pandas as pd

    toks = pc.split_pattern_regex(b[text_col], r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    words = flat.to_pandas().to_numpy()[keep]
    parents = parents[keep]
    if len(words) < n:
        return np.array([], dtype=np.int64), pd.Series([], dtype=object)
    valid = parents[: -(n - 1)] == parents[n - 1 :]
    gp = parents[: -(n - 1)][valid]
    g = pd.Series(words[: -(n - 1)][valid])
    for k in range(1, n):
        end = -(n - 1 - k) or None
        g = g + " " + pd.Series(words[k:end][valid])
    return gp, g


def decontaminate(
    docs,
    eval_mod: int = 97,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, n_shared_ngrams) for every TRAINING doc sharing at least
    one word-n-gram with the held-out eval slice (docs where
    ``id % eval_mod == 0`` stand in for a benchmark set) — the
    decontamination screen run before training so eval data cannot leak
    into the corpus. Shape: the eval slice's distinct grams are small by
    construction (benchmarks are), so they broadcast once via ray.put and
    the screen itself is an embarrassingly parallel is_in over each
    training doc's grams — no shuffle touches the corpus. For eval sets
    too large to broadcast as strings, see `decontaminate_bloom`."""
    import numpy as np
    import pandas as pd
    import ray

    def grams_of(b: pa.Table) -> tuple:
        return _word_ngrams(b, n, text_col)

    def eval_grams(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = pa.array(ids % eval_mod == 0)
        eb = b.filter(sel)
        if eb.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        _, g = grams_of(eb)
        return pa.table({"gram": pa.array(pd.unique(g), pa.string())})

    from ..functions.distinct import distinct_values

    eset = distinct_values(
        docs.map_batches(eval_grams, batch_format="pyarrow"), "gram"
    )
    eval_ref = ray.put(pa.array(eset, pa.string()))

    def screen(b: pa.Table) -> pa.Table:
        ids_all = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        train = b.filter(pa.array(ids_all % eval_mod != 0))
        if train.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "n_shared_ngrams": pa.array([], pa.int64()),
                }
            )
        gp, g = grams_of(train)
        vs = ray.get(eval_ref)
        hit = pc.is_in(pa.array(g, pa.string()), value_set=vs).to_numpy(
            zero_copy_only=False
        )
        shared = np.bincount(gp[hit], minlength=train.num_rows).astype(np.int64)
        out = pa.table(
            {
                id_col: train[id_col],
                "n_shared_ngrams": pa.array(shared, pa.int64()),
            }
        )
        return out.filter(pc.greater(out["n_shared_ngrams"], 0))

    return docs.map_batches(screen, batch_format="pyarrow")


def decontaminate_bloom(
    docs,
    eval_mod: int = 97,
    n: int = 8,
    fp_rate: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The SCALE path of `decontaminate`, for held-out sets too large to
    broadcast as exact gram strings (a multi-benchmark suite at 100 TB):

      1. eval gram HASHES (vectorized 64-bit) are deduped by one
         eval-side-only groupby and streamed into a bloom filter on the
         driver — the broadcast is the fixed-size filter (~10 bits/gram at
         1% fp), not the grams;
      2. the corpus screen is an embarrassingly parallel vectorized bloom
         probe per batch emitting candidate (doc_id, gram_hash)
         OCCURRENCES — true hits plus ~fp_rate of the corpus grams;
      3. candidates hash-join the exact eval hash set (both sides are
         now tiny/pruned), killing every false positive, then a per-doc
         count rebuilds n_shared_ngrams.

    Output equals `decontaminate` exactly, modulo 64-bit gram-hash
    collisions (the standard hashed-decontamination trade; a pytest pins
    equality at test scale). The corpus never shuffles — only candidate
    hash rows do."""
    import numpy as np
    import pandas as pd
    import ray

    from ray.data.aggregate import Count

    from ..state.bloom import CountingBloomFilter
    from .relational import _join_partitions

    def _hashes(g: pd.Series) -> np.ndarray:
        return pd.util.hash_array(g.to_numpy(object), categorize=False)

    def eval_hashes(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        eb = b.filter(pa.array(ids % eval_mod == 0))
        if eb.num_rows == 0:
            return pa.table({"gram_hash": pa.array([], pa.int64())})
        _, g = _word_ngrams(eb, n, text_col)
        return pa.table(
            {
                "gram_hash": pa.array(
                    np.unique(_hashes(g)).view(np.int64), pa.int64()
                )
            }
        )

    # one eval-side shuffle (eval-gram scale, not corpus scale) makes the
    # hash set globally unique, so the verify join cannot double-count
    eset = (
        docs.map_batches(eval_hashes, batch_format="pyarrow")
        .groupby("gram_hash")
        .aggregate(Count())
        .drop_columns(["count()"])
        .materialize()
    )
    n_eval = eset.count()
    bloom = CountingBloomFilter(capacity=max(n_eval, 1), fp_rate=fp_rate)
    for batch in eset.iter_batches(batch_format="pyarrow"):
        bloom.add_many(
            batch["gram_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        )
    bloom_ref = ray.put(bloom.to_state())

    def screen(b: pa.Table) -> pa.Table:
        ids_all = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        train = b.filter(pa.array(ids_all % eval_mod != 0))
        empty = pa.table(
            {
                id_col: pa.array([], b[id_col].type),
                "gram_hash": pa.array([], pa.int64()),
            }
        )
        if train.num_rows == 0:
            return empty
        gp, g = _word_ngrams(train, n, text_col)
        if not len(gp):
            return empty
        hs = _hashes(g)
        bf = CountingBloomFilter.from_state(ray.get(bloom_ref))
        hit = bf.might_contain_many(hs.astype(np.uint64))
        return pa.table(
            {
                id_col: train[id_col].combine_chunks().take(
                    pa.array(gp[hit])
                ),
                "gram_hash": pa.array(hs[hit].view(np.int64), pa.int64()),
            }
        )

    candidates = docs.map_batches(screen, batch_format="pyarrow")
    verified = candidates.join(
        eset,
        join_type="inner",
        num_partitions=_join_partitions(1),
        on=("gram_hash",),
        right_on=("gram_hash",),
    )
    return (
        verified.groupby(id_col)
        .aggregate(Count(alias_name="n_shared_ngrams"))
    )


# -- deterministic stratified sampling (source mixing) -----------------------

def stratified_sample(
    docs,
    rates: dict[str, int],
    mod: int = 100,
    default_rate: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Keep each row iff ``id % mod < rates[source]`` — deterministic
    per-source downsampling, the mixing step that rebalances corpus sources
    before training. Batch-local and shuffle-free; re-running (or resuming)
    selects the identical rows, which is what makes the sample reproducible
    across a 100-TB job's retries. Vectorized: rates gather via
    pc.index_in on the (tiny) source list + numpy modulo mask.

    The selector here is a plain modulo on the integer id so the DuckDB
    oracle can express the identical predicate; with non-integer or
    adversarial ids substitute a splitmix-style integer hash
    (functions/hashing.stable_hash64) on both sides of the threshold —
    the operator shape is unchanged."""
    import numpy as np

    src_keys = pa.array(list(rates.keys()), pa.string())
    pct = np.array(list(rates.values()), dtype=np.int64)

    def sbatch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(b[source_col], value_set=src_keys)
        known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        idx_f = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.where(known, pct[idx_f], default_rate)
        keep = (ids % mod) < rate
        return pa.table(
            {id_col: b[id_col], source_col: b[source_col]}
        ).filter(pa.array(keep))

    return docs.map_batches(sbatch, batch_format="pyarrow")


def source_cap(
    docs,
    cap: int = 100,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Cap any single source's share: keep at most ``cap`` docs per source
    — the ``cap`` smallest ``id_col`` values, so the selection is
    deterministic and resume-stable. The quota-based companion to
    ``stratified_sample``'s rate-based mixing: rates rebalance
    proportionally, a cap bounds a dominating crawl source absolutely.

    Scale shape — two-level selection, no per-source sort of the corpus:
      1. block-local prune: each block keeps its ``cap`` smallest ids per
         source (vectorized pandas sort+head), so at most
         blocks×sources×cap rows survive;
      2. the bounded survivors co-locate via one groupby over the (tiny)
         source key and the final per-source head(cap) runs in one task.
    Returns (doc_id, source)."""
    import pandas as pd

    def local_prune(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([source_col, id_col], kind="stable")
            .groupby(source_col, sort=False)
            .head(cap)
        )

    pruned = docs.map_batches(
        lambda b: pa.Table.from_pandas(
            local_prune(b.select([id_col, source_col]).to_pandas()),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )

    return pruned.groupby(source_col).map_groups(
        lambda g: g.sort_values(id_col, kind="stable").head(cap),
        batch_format="pandas",
    )


# -- sequence packing (concat-and-chunk) -------------------------------------

def pack_sequences(
    docs,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """(doc_id, n_tokens, offset, pack_id): GPT-style concat-and-chunk
    sequence packing. Documents are concatenated in ``id_col`` order; each
    doc's ``offset`` is the global token prefix-sum before it and
    ``pack_id = offset // budget`` assigns it to a fixed-token-budget
    training sequence. (Deterministic chunking, the common scalable
    packing rule — NOT greedy bin-packing, which needs a sequential scan.)

    Distributed as a two-pass range-partitioned prefix sum — the textbook
    scan at 100 TB:
      1. per-doc whitespace token counts (vectorized), range partition by
         id quantile (``n_parts`` buckets over the observed id domain);
      2. per-partition token totals (tiny groupby) -> driver-side exclusive
         prefix over the ordered partition totals (n_parts values) ->
         broadcast;
      3. per-partition sorted local cumsum + partition base offset.
    Only (doc_id, n_tokens) pairs ever shuffle; text stays put.
    """
    counts = docs.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pc.count_substring_regex(
                    b[text_col], r"\S+"
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    return _pack_counts(counts, budget, id_col, n_parts)


def _pack_counts(counts, budget: int, id_col: str, n_parts: int):
    """The distributed concat-and-chunk core over a materialized
    ``(id_col: int64, n_tokens)`` table — the two-pass range-partitioned
    prefix sum documented in ``pack_sequences``. Shared by
    ``pack_sequences`` (whitespace-token costs) and ``pack_interleaved``
    (multimodal token totals)."""
    import numpy as np
    import pandas as pd
    import ray

    # id domain for range partitioning (two tiny aggregate passes over a
    # projected column — parquet footers make these near-free at the read)
    from ray.data.aggregate import Max, Min

    bounds = counts.aggregate(Min(id_col), Max(id_col))
    lo, hi = bounds[f"min({id_col})"], bounds[f"max({id_col})"]
    span = max(1, int(hi) - int(lo) + 1)

    def with_part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((ids - int(lo)) * n_parts // span).astype(np.int32)
        return b.append_column("part", pa.array(part))

    parted = counts.map_batches(with_part, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Sum

    totals = {
        r["part"]: r["part_total"]
        for r in parted.groupby("part")
        .aggregate(Sum("n_tokens", alias_name="part_total"))
        .take_all()
    }
    base = 0
    bases = {}
    for p in range(n_parts):
        bases[p] = base
        base += int(totals.get(p, 0))
    bases_ref = ray.put(bases)

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        off = np.cumsum(n) - n + ray.get(bases_ref)[int(g["part"].iloc[0])]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": n,
                "offset": off,
                "pack_id": off // budget,
            }
        )

    return parted.groupby("part").map_groups(pack_part, batch_format="pandas")


def pack_interleaved(inter, budget: int = 2048, n_parts: int = 64):
    """(doc_id, n_tokens, offset, pack_id) over an INTERLEAVED corpus:
    concat-and-chunk packing where each doc costs its multimodal token
    total (text tokens + ``interleave.MEDIA_TOKEN_BUDGET`` placeholder
    positions per media span) — the packing stage a multimodal training
    pipeline actually runs. Composition: ``interleaved_token_counts``
    (block-local accounting) feeds the same two-pass range-partitioned
    prefix sum as ``pack_sequences``; spans never shuffle, only
    (doc_id, n_tokens) pairs.

    Requires integer-castable doc ids for the range partition / pack order
    (the synthesiser's contract; crawl-emitted string ids should first map
    through an id-assignment pass)."""
    from .interleave import interleaved_token_counts

    counts = (
        interleaved_token_counts(inter)
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "n_tokens": b["n_tokens_total"],
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    packed = _pack_counts(counts, budget, "doc_id", n_parts)
    # emit the interleaved contract's string id type
    return packed.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("doc_id"),
            "doc_id",
            pc.cast(b["doc_id"], pa.string()),
        ),
        batch_format="pyarrow",
    )


def chunk_token_windows(
    docs,
    window: int = 256,
    stride: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, chunk_id, n_tokens, chunk_text): fixed-stride token-window
    chunking — the long-document training prep that slices each doc's
    whitespace-token sequence into windows of up to ``window`` tokens
    starting every ``stride`` tokens (stride < window overlaps, stride ==
    window tiles). Window k covers tokens [k*stride, k*stride+window) and
    windows are emitted while k*stride < n_tokens, so every token lands in
    at least one chunk and tail chunks may be short; 0-token docs emit no
    chunks. ``chunk_text`` is the window's tokens joined by a single space
    (whitespace-collapsing, same token alphabet as ``token_count_table``'s
    ``n_ws_tokens``).

    Fully vectorized and shuffle-free: per batch, split -> flat word array
    -> numpy repeat/arange window index construction -> one ``take`` + one
    ``binary_join``. No per-row Python; 100-TB shape is a pure map."""
    import numpy as np

    W, S = int(window), int(stride)
    if W <= 0 or S <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks()
        txt = pc.utf8_trim_whitespace(pc.fill_null(b[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(txt, r"\s+")
        flat_words = pc.list_flatten(words)
        if isinstance(flat_words, pa.ChunkedArray):
            flat_words = flat_words.combine_chunks()
        # actual list layout lengths (empty text splits to [""] — length 1)
        wl = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        word_starts = np.zeros(len(wl) + 1, np.int64)
        np.cumsum(wl, out=word_starts[1:])
        # token counts under the \S+ contract (0 for empty/ws-only text)
        wc = (
            pc.count_substring_regex(txt, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_chunks = np.where(wc > 0, (wc + S - 1) // S, 0)
        total = int(n_chunks.sum())
        first_chunk = np.cumsum(n_chunks) - n_chunks
        doc_of_chunk = np.repeat(np.arange(len(wc)), n_chunks)
        chunk_rank = np.arange(total) - first_chunk[doc_of_chunk]
        rel_start = chunk_rank * S
        lens = np.minimum(W, wc[doc_of_chunk] - rel_start)
        total_pos = int(lens.sum())
        first_pos = np.cumsum(lens) - lens
        pos_rank = np.arange(total_pos) - np.repeat(first_pos, lens)
        tok_idx = np.repeat(word_starts[doc_of_chunk] + rel_start, lens) + pos_rank
        chunk_list = pa.ListArray.from_arrays(
            pa.array(np.append(first_pos, total_pos).astype(np.int32), pa.int32()),
            flat_words.take(pa.array(tok_idx, pa.int64())),
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_of_chunk, pa.int64())),
                "chunk_id": pa.array(chunk_rank, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "chunk_text": pc.binary_join(chunk_list, " ").cast(pa.string()),
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow")


def write_train_shards(
    docs,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
):
    """Materialize the training layout on disk: one parquet directory per
    shard (``out_dir/shard=K/``), rows carrying (doc_id, text..., shard,
    train_pos) with ``train_pos`` the within-shard pseudo-shuffle order —
    the resumable partitioned sink the brief mandates (a failed run skips
    finished ``shard=K`` directories; never one giant file).

    Dataflow: ``pseudo_shuffle_shards`` computes (id, shard, train_pos)
    over id-only rows; the assignment joins back onto the doc rows via the
    cost-based attach (broadcast at bench scale, hash shuffle at corpus
    scale) so text moves exactly once — into its shard file. Returns the
    number of rows written."""
    import ray

    from .relational import _attach_or_join

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)
    assign = pseudo_shuffle_shards(
        docs.select_columns([id_col]), n_shards=n_shards, id_col=id_col
    )
    tagged = _attach_or_join(
        docs, id_col, assign, id_col, ["shard", "train_pos"], npart
    ).materialize()
    tagged.write_parquet(out_dir, partition_cols=["shard"])
    return tagged.count()


# -- pseudo-shuffle shard split (training output layout) ---------------------

def train_val_test_split(
    docs,
    train_pct: int = 90,
    val_pct: int = 5,
    id_col: str = "doc_id",
):
    """(doc_id, split): deterministic train/val/test assignment — the
    holdout-carving step every training corpus needs before packing.
    Uses `pseudo_shuffle_shards`' 32-bit LCG mix (not the raw id) so the
    split is decorrelated from crawl/id order, then thresholds
    ``mix % 100``: [0, train_pct) -> train, [train_pct, train_pct+val_pct)
    -> val, rest -> test. Batch-local, shuffle-free, retry-reproducible,
    and disjoint by construction — the id-keyed analog of the
    `stratified_sample` predicate, mirrored literally by the SQL oracle.
    Same int64-exactness bound as pseudo_shuffle_shards (doc_id < ~3.4e9;
    swap in splitmix64 beyond)."""
    import numpy as np

    t_hi, v_hi = int(train_pct), int(train_pct) + int(val_pct)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        r = ((ids * 2654435761 + 1013904223) % (2**32)) % 100
        split = np.where(r < t_hi, "train", np.where(r < v_hi, "val", "test"))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def pseudo_shuffle_shards(docs, n_shards: int = 16, id_col: str = "doc_id"):
    """(doc_id, shard, train_pos): deterministic global-shuffle-equivalent.

    The last step of a training-data pipeline is "shuffle the corpus and
    split it into shards". ``Dataset.random_shuffle`` is a full all-to-all
    over the DATA; this operator gets the same statistical effect by
    hashing ids into shards and ordering within each shard by the hash's
    upper bits — the only shuffle is a groupby over (id, shard, key) rows,
    never text, and the result is reproducible across retries (seeded by
    the multiplier, not an RNG).

    Mixing is a 32-bit LCG step mirrored literally by the SQL oracle:
    ``mix = (doc_id * 2654435761 + 1013904223) % 2**32`` (Knuth
    multiplicative + Numerical Recipes increment). Exact in int64 for
    doc_id < ~3.4e9; beyond that (10^10-id corpora) swap the mixer for
    unsigned splitmix64 in numpy — same dataflow, no SQL mirror.

    train_pos is the 0-based position within the shard (row_number over
    (mix upper bits, doc_id)); a downstream writer streams each shard in
    train_pos order to its own file.
    """
    import numpy as np

    S = int(n_shards)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mix = (ids * 2654435761 + 1013904223) % (2**32)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shard": pa.array(mix % S, pa.int64()),
                "okey": pa.array(mix // S, pa.int64()),
            }
        )

    def order_shard(g):
        import pandas as pd

        idx = np.lexsort((g[id_col].to_numpy(), g["okey"].to_numpy()))
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[idx],
                "shard": g["shard"].to_numpy()[idx],
                "train_pos": np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order_shard, batch_format="pandas")
    )


def source_quality_stats(
    docs,
    source_col: str = "source",
    text_col: str = "text",
):
    """(source, n_docs, avg_chars, alpha_ratio): the per-source corpus
    health rollup a curation dashboard tracks (which feeds dropping or
    re-weighting whole sources). Defined over ADDITIVE integer sums
    (chars, alpha chars) so per-block partials merge exactly: one
    map_batches partial per block, then a source-keyed groupby over
    (source, 3 ints) rows — never text."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                source_col: b[source_col],
                "chars": pc.utf8_length(b[text_col]).cast(pa.int64()),
                "alpha": pc.count_substring_regex(
                    b[text_col], "[A-Za-z]"
                ).cast(pa.int64()),
            }
        )
        g = t.group_by([source_col]).aggregate(
            [("chars", "sum"), ("alpha", "sum"), ([], "count_all")]
        )
        return g.rename_columns([source_col, "chars", "alpha", "n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(
            Sum("chars", alias_name="chars"),
            Sum("alpha", alias_name="alpha"),
            Sum("n", alias_name="n_docs"),
        )
    )

    def final(b: pa.Table) -> pa.Table:
        chars = b["chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        alpha = b["alpha"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                source_col: b[source_col],
                "n_docs": b["n_docs"],
                "avg_chars": pa.array(
                    round_half_away(chars / np.maximum(n, 1), 6), pa.float64()
                ),
                "alpha_ratio": pa.array(
                    round_half_away(
                        np.divide(
                            alpha,
                            chars,
                            out=np.zeros_like(alpha),
                            where=chars > 0,
                        ),
                        6,
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


# -- compression-ratio quality signal -----------------------------------------

def compression_ratios(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, zlib_ratio): DEFLATE size over raw size — the
    classic redundancy gate (CCNet/Gopher family): machine-generated or
    highly repetitive text compresses far below prose (~0.3-0.6 for
    natural language; near 0 for degenerate repetition). Per-doc zlib is
    inherently per-row CPU work (same idiom as the md5 content hash);
    everything around it is Arrow. Shuffle-free. Not SQL-expressible ->
    rows-only at the driver, planted-redundancy pytest."""
    import zlib

    import numpy as np

    def ratios(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in texts], np.float64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts],
            np.float64,
        )
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table(
            {
                id_col: b[id_col],
                "n_chars": pc.utf8_length(b[text_col]).cast(pa.int64()),
                "zlib_ratio": pa.array(
                    round_half_away(ratio, 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(ratios, batch_format="pyarrow")


def dsir_weights(
    docs,
    target_source: str = "src0",
    n_buckets: int = 64,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
):
    """(doc_id, n_tokens, logw): DSIR-style importance resampling (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") — rank raw documents by how much they look like a target
    domain under hashed-unigram bag-of-words models. The top-``k`` docs by
    ``logw = sum_tokens[ ln p_tgt(bucket) - ln p_src(bucket) ]`` (add-1
    smoothing over ``n_buckets`` hashed buckets; target = docs whose
    ``source_col`` equals ``target_source``, source = the whole corpus).

    Two passes, both 100-TB-shaped:
      1. fit: per-block (bucket, c_src, c_tgt) partials (token -> bucket
         via a char-fold hash computed once per block-unique term) -> a
         ``n_buckets``-bounded groupby -> the CONSTANT-size delta table is
         broadcast once via ray.put;
      2. score: embarrassingly parallel per-doc bincount dot, then a
         distributed sort + limit(k).
    The char-fold hash (acc = (acc*31 + codepoint) % n_buckets, seeded
    with the first codepoint, final mod) is chosen to be expressible in
    the DuckDB oracle via list_reduce/list_transform. logw rounded 6dp;
    docs with zero kept tokens emit no row. Deterministic tiebreak:
    (logw desc, doc_id asc)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from .index import tokenize_batch

    B = int(n_buckets)

    from ..functions.hashing import fold_bucket

    def _bucket_of(uniq_terms) -> "np.ndarray":
        return np.array(
            [fold_bucket(t, B) for t in uniq_terms], np.int64
        ) if len(uniq_terms) else np.empty(0, np.int64)

    def bucket_counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col=source_col, text_col=text_col)
        terms = t["term"].to_numpy(zero_copy_only=False)
        srcs = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        bk = _bucket_of(uniq)[inv] if len(uniq) else np.empty(0, np.int64)
        c_src = np.bincount(bk, minlength=B)
        c_tgt = np.bincount(bk[srcs == target_source], minlength=B)
        nz = np.nonzero(c_src)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_src": pa.array(c_src[nz], pa.int64()),
                "c_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    rows = (
        docs.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_src", alias_name="src"), Sum("c_tgt", alias_name="tgt"))
        .take_all()  # n_buckets-bounded pull (constant size)
    )
    src = np.zeros(B, np.float64)
    tgt = np.zeros(B, np.float64)
    for r in rows:
        src[int(r["bucket"])] = float(r["src"])
        tgt[int(r["bucket"])] = float(r["tgt"])
    ts, tt = src.sum(), tgt.sum()
    delta = np.log((tgt + 1.0) / (tt + B)) - np.log((src + 1.0) / (ts + B))
    delta_ref = ray.put(delta)

    def score(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        terms = t["term"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        bk = _bucket_of(uniq)[inv] if len(uniq) else np.empty(0, np.int64)
        d = ray.get(delta_ref)[bk]
        uids, dinv = np.unique(ids, return_inverse=True)
        n_tok = np.bincount(dinv)
        sums = np.bincount(dinv, weights=d)
        return pa.table(
            {
                id_col: pa.array(uids, b[id_col].type),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "logw": pa.array(round_half_away(sums, 6), pa.float64()),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["logw", id_col], descending=[True, False])
        .limit(k)
    )


def gopher_gates(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 4.6,
    alpha_min: float = 0.82,
    max_word_len: int = 7,
):
    """(doc_id, n_ws_tokens, word_count_ok, mean_word_len_ok, alpha_ok,
    max_word_len_ok, pass_all): Gopher/Dolma-style repetition-free quality
    gate flags — the standard document-level curation rules (word-count
    band, mean-word-length band, alphabetic-character floor, max-token-
    length ceiling), each emitted as its own boolean so downstream
    pipelines can report per-rule rejection rates, plus the AND. Pure
    per-batch Arrow/numpy kernels (regex counts + one flatten/segment-max),
    shuffle-free; zero-token docs fail every token-derived gate. Ratio
    arithmetic uses the same double-op order as the SQL mirror; the alpha
    ratio is rounded 6dp before comparison (shared definition with
    ``quality_scores``)."""
    import numpy as np

    def gates(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b[text_col], "")
        n = b.num_rows
        wc = pc.count_substring_regex(txt, r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nonws = pc.utf8_length(
            pc.replace_substring_regex(txt, r"\s", "")
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nalpha = pc.count_substring_regex(txt, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        alpha6 = np.asarray(
            round_half_away(
                np.divide(
                    nalpha, nchars, out=np.zeros(n), where=nchars > 0
                ),
                6,
            )
        )
        # per-doc max token length: flatten + segment max
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(txt, "")), r"\s+"
        )
        flat_len = pc.utf8_length(pc.list_flatten(words)).to_numpy(
            zero_copy_only=False
        )
        parents = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        maxlen = np.zeros(n, np.int64)
        np.maximum.at(maxlen, parents, flat_len)

        mean = np.divide(
            nonws, wc, out=np.zeros(n), where=wc > 0
        )
        word_ok = (wc >= min_words) & (wc <= max_words)
        mean_ok = (wc > 0) & (mean >= mean_len_lo) & (mean <= mean_len_hi)
        alpha_ok = alpha6 >= alpha_min
        maxlen_ok = (wc > 0) & (maxlen <= max_word_len)
        return pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": pa.array(wc, pa.int64()),
                "word_count_ok": pa.array(word_ok),
                "mean_word_len_ok": pa.array(mean_ok),
                "alpha_ok": pa.array(alpha_ok),
                "max_word_len_ok": pa.array(maxlen_ok),
                "pass_all": pa.array(
                    word_ok & mean_ok & alpha_ok & maxlen_ok
                ),
            }
        )

    return docs.map_batches(gates, batch_format="pyarrow")


def split_sentences(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, sent_id, sentence): sentence segmentation — split on runs
    of sentence-final punctuation ``[.!?]+`` (punctuation consumed),
    whitespace-trim each segment, drop empties; ``sent_id`` is the 0-based
    ordinal among the doc's kept sentences. Fully vectorized per batch
    (split -> flatten -> trim -> mask -> bincount renumber), shuffle-free;
    punctuation-free docs yield one sentence, empty docs yield none."""
    import numpy as np

    def split(b: pa.Table) -> pa.Table:
        n = b.num_rows
        segs = pc.split_pattern_regex(
            pc.fill_null(b[text_col], ""), r"[.!?]+"
        )
        # explicit trim set (not Unicode-whitespace) so the SQL mirror's
        # trim(x, ' \t\n\r') is character-identical
        flat = pc.utf8_trim(pc.list_flatten(segs), characters=" \t\n\r")
        parents = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
        mask = pc.greater(pc.utf8_length(flat), 0)
        mask_np = mask.to_numpy(zero_copy_only=False)
        kept = pc.filter(flat, mask)
        parents = parents[mask_np]
        counts = np.bincount(parents, minlength=n)
        starts = np.cumsum(counts) - counts
        sent_id = np.arange(len(parents)) - starts[parents]
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(
                    pa.array(parents, pa.int64())
                ),
                "sent_id": pa.array(sent_id.astype(np.int64), pa.int64()),
                "sentence": kept.cast(pa.string()),
            }
        )

    return docs.map_batches(split, batch_format="pyarrow")


def _hashed_features(docs, dims, id_col, text_col, source_col, target_source):
    """(doc_id, y, x list<double>): hashed-BoW features for the quality
    classifier — the DSIR char-fold bucket histogram normalized by kept
    token count, plus a trailing bias 1.0; y = 1 when ``source_col``
    equals ``target_source``. One pass over text; the feature table is
    rows x (dims+2) scalars, far smaller than the corpus."""
    import numpy as np

    from .index import tokenize_batch

    def feat(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = tokenize_batch(b, id_col, text_col)
        toks = t["term"].to_numpy(zero_copy_only=False)
        from ..functions.hashing import fold_bucket

        uniq, inv = np.unique(toks, return_inverse=True)
        bk = np.array([fold_bucket(w, dims) for w in uniq], np.int64)
        buckets = bk[inv] if len(uniq) else np.empty(0, np.int64)
        # map token rows back to batch row index (unique-bounded dict,
        # vectorized fan-out — never a per-token Python loop)
        ids_tok = t["doc_id"].to_numpy(zero_copy_only=False)
        ids_row = b[id_col].to_numpy(zero_copy_only=False)
        uid, tok_inv = np.unique(ids_tok, return_inverse=True)
        pos_of = {v: i for i, v in enumerate(ids_row)}
        uid_rows = np.array([pos_of[v] for v in uid], np.int64)
        rows = uid_rows[tok_inv] if len(uid) else np.empty(0, np.int64)
        mat = np.zeros((n, dims + 1), np.float64)
        np.add.at(mat, (rows, buckets), 1.0)
        tot = mat[:, :dims].sum(axis=1)
        mat[:, :dims] /= np.maximum(tot, 1.0)[:, None]
        mat[:, dims] = 1.0  # bias
        y = (
            b[source_col].to_numpy(zero_copy_only=False) == target_source
        ).astype(np.int8)
        return pa.table(
            {
                id_col: b[id_col],
                "y": pa.array(y, pa.int8()),
                "x": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    return docs.map_batches(feat, batch_format="pyarrow")


def train_quality_classifier(
    docs,
    target_source: str = "src0",
    dims: int = 64,
    epochs: int = 30,
    lr: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    inmemory_threshold: int = 2_000_000,
    features=None,
):
    """Train the fasttext-style quality classifier curation pipelines gate
    on (GPT-3/LLaMA-style: logistic regression over hashed-BoW features,
    positives = a trusted domain): full-batch gradient descent, returning
    the (dims+1,) weight vector.

    Cost-based two-path (the repo's iterative-algorithm rule): features
    are computed ONCE and materialized (rows x (dims+2) scalars — text is
    never re-read per epoch). At or below ``inmemory_threshold`` rows the
    feature table pulls once and GD runs in numpy (each distributed round
    costs seconds of fixed exchange setup); above it each epoch is one
    map_batches partial-gradient pass (X^T(sigmoid(Xw)-y) and row count
    per block) reduced on the driver — a (dims+1)-sized exchange per
    epoch. Both paths run the same math; the equality test pins them."""
    import numpy as np
    import ray

    feats = (
        features
        if features is not None
        else _hashed_features(
            docs, dims, id_col, text_col, source_col, target_source
        ).materialize()
    )
    n_rows = feats.count()
    w = np.zeros(dims + 1, np.float64)

    def _sig(z):
        return 1.0 / (1.0 + np.exp(-z))

    if n_rows <= inmemory_threshold:
        tbl = feats.to_pandas()
        X = np.asarray([np.asarray(v) for v in tbl["x"]], np.float64)
        y = tbl["y"].to_numpy().astype(np.float64)
        for _ in range(epochs):
            g = X.T @ (_sig(X @ w) - y) / n_rows
            w = w - lr * g
        return w

    for _ in range(epochs):
        w_ref = ray.put(w)

        def grad_part(b: pa.Table) -> pa.Table:
            ww = ray.get(w_ref)
            X = np.asarray(
                b["x"].combine_chunks().flatten(), np.float64
            ).reshape(b.num_rows, dims + 1)
            y = b["y"].to_numpy(zero_copy_only=False).astype(np.float64)
            g = X.T @ (_sig(X @ ww) - y)
            return pa.table({"g": pa.array([g], pa.list_(pa.float64()))})

        parts = feats.map_batches(grad_part, batch_format="pyarrow").take_all()
        g = np.zeros(dims + 1, np.float64)
        for p in parts:  # one (dims+1) vector per block
            g += np.asarray(p["g"], np.float64)
        w = w - lr * g / n_rows
    return w


def score_quality_classifier(
    docs,
    weights,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    target_source: str = "src0",
    features=None,
):
    """(doc_id, y, p_target): sigmoid scores under a trained quality
    classifier — the gate column a curation pipeline thresholds on.
    Broadcast weights, embarrassingly parallel; p rounded 6dp. Pass the
    training run's materialized ``features`` to avoid re-reading text."""
    import numpy as np
    import ray

    w_ref = ray.put(np.asarray(weights, np.float64))

    def score(b: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        X = np.asarray(
            b["x"].combine_chunks().flatten(), np.float64
        ).reshape(b.num_rows, len(w))
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        return pa.table(
            {
                id_col: b[id_col],
                "y": b["y"],
                "p_target": pa.array(round_half_away(p, 6), pa.float64()),
            }
        )

    feats = (
        features
        if features is not None
        else _hashed_features(
            docs, dims, id_col, text_col, source_col, target_source
        )
    )
    return feats.map_batches(score, batch_format="pyarrow")


def bigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text",
                   max_model_terms: int | None = None):
    """(doc_id, n_transitions, avg_logprob): per-document mean conditional
    log-probability under an add-1-smoothed BIGRAM language model trained
    on the corpus itself — one rung up the CCNet/KenLM perplexity-gate
    ladder from ``unigram_logprob`` (repetitive or template-like docs
    score HIGH, incoherent token salads score LOW).
    ``P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)`` with V
    = distinct kept terms; scored over the doc's kept-token transitions
    (docs with < 2 kept tokens emit no row). Two passes, the
    unigram_logprob shape: one tokenize pass emits bigram+unigram partial
    counts (tagged union), the model pulls once (bigram-type-bounded —
    sublinear in corpus size; same bounded-model contract the unigram
    gate documents) and broadcasts via ray.put; scoring is per-batch
    searchsorted over 'w1 w2' keys (terms never contain spaces — the
    tokenizer splits on them).

    ``max_model_terms`` bounds the pull/broadcast to the top-V bigram
    types AND top-V unigram types by count (two distributed sort+limits;
    bigram types are strictly worse than unigram vocabulary at open-web
    scale, so the bound matters here most). Tail defaults at lookup:
    unseen bigram c(w1 w2)=0 (exactly what add-1 smoothing is for) and
    unseen unigram c(w1)=1 (the lower bound — every dropped type was seen
    at least once). V (the smoothing denominator's vocabulary size) stays
    the EXACT distinct-term count in both modes (a scalar count, never a
    pull). None = exact full model (the oracle contract); 100-TB setting
    ~10-50M types."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from .index import tokenize_batch

    def gram_partials(b: pa.Table) -> pa.Table:
        tok = tokenize_batch(b, id_col, text_col)
        n = tok.num_rows
        terms = tok["term"].combine_chunks()
        uni = (
            pa.table({"w1": terms})
            .group_by(["w1"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "n"])
        )
        uni = uni.append_column("w2", pa.array([""] * uni.num_rows, pa.string()))
        out = [uni.select(["w1", "w2", "n"])]
        if n >= 2:
            ids = tok["doc_id"].combine_chunks()
            same = pc.equal(ids.slice(0, n - 1), ids.slice(1, n))
            t = pa.table(
                {
                    "w1": pc.filter(terms.slice(0, n - 1), same),
                    "w2": pc.filter(terms.slice(1, n), same),
                }
            )
            g = (
                t.group_by(["w1", "w2"])
                .aggregate([([], "count_all")])
                .rename_columns(["w1", "w2", "n"])
            )
            out.append(g)
        schema = pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]
        )
        return pa.concat_tables([x.cast(schema) for x in out])

    gram_ds = (
        docs.map_batches(gram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="c"))
    )
    if max_model_terms is None:
        grams = gram_ds.take_all()  # type-bounded model pull (see docstring)
        uni_rows = [r for r in grams if r["w2"] == ""]
        bi_rows = [r for r in grams if r["w2"] != ""]
        V = len(uni_rows)
    else:
        gram_ds = gram_ds.materialize()
        uni_only = gram_ds.map_batches(
            lambda b: b.filter(pc.equal(b["w2"], "")), batch_format="pyarrow"
        )
        bi_only = gram_ds.map_batches(
            lambda b: b.filter(pc.not_equal(b["w2"], "")), batch_format="pyarrow"
        )
        V = uni_only.count()  # exact vocab size in both modes (scalar)
        uni_rows = (
            uni_only.sort(["c", "w1"], descending=[True, False])
            .limit(int(max_model_terms))
            .take_all()
        )
        bi_rows = (
            bi_only.sort(["c", "w1", "w2"], descending=[True, False, False])
            .limit(int(max_model_terms))
            .take_all()
        )
    uni_c = {r["w1"]: int(r["c"]) for r in uni_rows}
    bi_keys = np.array([r["w1"] + " " + r["w2"] for r in bi_rows])
    bi_cnts = np.array([float(r["c"]) for r in bi_rows], np.float64)
    order = np.argsort(bi_keys)
    bi_keys, bi_cnts = bi_keys[order], bi_cnts[order]
    u_terms = np.array(sorted(uni_c))
    u_cnts = np.array([uni_c[t] for t in u_terms], np.float64)
    model_ref = ray.put((bi_keys, bi_cnts, u_terms, u_cnts, V))

    def score(b: pa.Table) -> pa.Table:
        tok = tokenize_batch(b, id_col, text_col)
        n = tok.num_rows
        if n < 2:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "n_transitions": pa.array([], pa.int64()),
                    "avg_logprob": pa.array([], pa.float64()),
                }
            )
        bi_k, bi_c, u_t, u_c, v = ray.get(model_ref)
        ids = tok["doc_id"].combine_chunks()
        terms = tok["term"].combine_chunks()
        same = pc.equal(ids.slice(0, n - 1), ids.slice(1, n))
        same_np = same.to_numpy(zero_copy_only=False)
        w1 = pc.filter(terms.slice(0, n - 1), same).to_numpy(zero_copy_only=False)
        w2 = pc.filter(terms.slice(1, n), same).to_numpy(zero_copy_only=False)
        tid = pc.filter(
            ids.slice(0, n - 1), same
        ).to_numpy(zero_copy_only=False)
        if not len(w1):
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "n_transitions": pa.array([], pa.int64()),
                    "avg_logprob": pa.array([], pa.float64()),
                }
            )
        keys = np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str))
        # unbounded mode: trained on this corpus, every pair/term hits;
        # bounded mode: miss defaults c_ab=0 (add-1 smooths it), c_a=1
        if bi_k.size:
            bpos = np.clip(np.searchsorted(bi_k, keys), 0, bi_k.size - 1)
            c_ab = np.where(bi_k[bpos] == keys, bi_c[bpos], 0.0)
        else:
            c_ab = np.zeros(len(keys))
        if u_t.size:
            upos = np.clip(np.searchsorted(u_t, w1), 0, u_t.size - 1)
            c_a = np.where(u_t[upos] == w1, u_c[upos], 1.0)
        else:
            c_a = np.ones(len(w1))
        lp = np.log((c_ab + 1.0) / (c_a + v))
        uids, dinv = np.unique(tid, return_inverse=True)
        n_tr = np.bincount(dinv)
        sums = np.bincount(dinv, weights=lp)
        return pa.table(
            {
                id_col: pa.array(uids, b[id_col].type),
                "n_transitions": pa.array(n_tr.astype(np.int64), pa.int64()),
                "avg_logprob": pa.array(
                    round_half_away(sums / n_tr, 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def token_budget_select(
    docs,
    budget: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """(doc_id, n_tokens, avg_logprob): the dataset-ASSEMBLY decision —
    greedily keep the highest-quality documents (by the ``unigram_logprob``
    gate score, ties broken by doc_id) until the global token budget
    fills; the straddling doc is included (kept iff the tokens ranked
    strictly before it total < ``budget``). This is the final "we can
    afford B training tokens, which docs make the cut" step.

    Scale shape — ``quality_buckets``' two-pass range-partitioned global
    order, but prefix-summing TOKENS instead of ranks: score rows range-
    partition by value (ties land in one partition, so cross-partition
    order is exact), per-partition token totals -> driver exclusive
    prefix over ``n_parts`` values -> within-partition sorted cumsum +
    base. Only (doc_id, n_tokens, avg_logprob) rows shuffle; text stays
    put (semi-join the kept ids back for the corpus itself)."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Max, Min, Sum

    lp = unigram_logprob(docs, id_col, text_col).materialize()
    b = lp.aggregate(Min("avg_logprob"), Max("avg_logprob"))
    if b is None or b["min(avg_logprob)"] is None:
        return lp  # zero scored docs: empty, schema already right
    lo, hi = float(b["min(avg_logprob)"]), float(b["max(avg_logprob)"])
    span = (hi - lo) or 1.0

    def with_part(t: pa.Table) -> pa.Table:
        v = t["avg_logprob"].to_numpy(zero_copy_only=False)
        part = np.clip(
            ((hi - v) / span * n_parts).astype(np.int64), 0, n_parts - 1
        )
        return t.append_column("part", pa.array(part.astype(np.int32)))

    parted = lp.map_batches(with_part, batch_format="pyarrow").materialize()
    totals = {
        r["part"]: int(r["t"])
        for r in parted.groupby("part")
        .aggregate(Sum("n_tokens", alias_name="t"))
        .take_all()
    }
    base, bases = 0, {}
    for p in range(n_parts):
        bases[p] = base
        base += int(totals.get(p, 0))
    bases_ref = ray.put(bases)

    def select_part(g: pd.DataFrame) -> pd.DataFrame:
        v = g["avg_logprob"].to_numpy()
        ids = g[id_col].to_numpy()
        ntok = g["n_tokens"].to_numpy(dtype=np.int64)
        idx = np.lexsort((ids, -v))
        ntok_s = ntok[idx]
        before = (
            np.cumsum(ntok_s) - ntok_s
            + ray.get(bases_ref)[int(g["part"].iloc[0])]
        )
        keep = before < budget
        return pd.DataFrame(
            {
                id_col: ids[idx][keep],
                "n_tokens": ntok_s[keep],
                "avg_logprob": v[idx][keep],
            }
        )

    return parted.groupby("part").map_groups(
        select_part, batch_format="pandas"
    )


def pack_sequences_ffd(
    docs,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """(doc_id, n_tokens, pack_id): first-fit-decreasing bin packing —
    the OTHER standard sequence-packing strategy next to
    ``pack_sequences``' concat-and-chunk: docs are never split, each pack
    holds whole documents totalling <= ``budget`` tokens (docs longer
    than the budget get a singleton pack), and FFD's sort-by-length-desc
    first-fit gives near-optimal pack counts.

    FFD is inherently sequential, so the scale shape is PARTITION-LOCAL
    FFD (the standard practical compromise — packing quality is local to
    an id-range partition, bounded waste vs global FFD) + a global pack
    relabel: per-partition FFD emits local pack ids, the driver takes the
    ``n_parts`` per-partition pack counts, prefixes them, and a broadcast
    base map rewrites ids. Only (doc_id, n_tokens) rows shuffle."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Max, Min

    counts = docs.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pc.count_substring_regex(
                    pc.fill_null(b[text_col], ""), r"\S+"
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    bounds = counts.aggregate(Min(id_col), Max(id_col))
    if bounds is None or bounds[f"min({id_col})"] is None:
        return counts.map_batches(
            lambda b: b.append_column(
                "pack_id", pa.array([], pa.int64())
            ),
            batch_format="pyarrow",
        )
    lo, hi = int(bounds[f"min({id_col})"]), int(bounds[f"max({id_col})"])
    span = max(1, hi - lo + 1)

    def with_part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((ids - lo) * n_parts // span).astype(np.int32)
        return b.append_column("part", pa.array(part))

    parted = counts.map_batches(with_part, batch_format="pyarrow")

    def ffd_part(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        ntok = g["n_tokens"].to_numpy(dtype=np.int64)
        # FFD: length desc, id asc tiebreak; first pack with room wins
        order = np.lexsort((ids, -ntok))
        room: list[int] = []  # remaining room per local pack
        pack = np.empty(len(g), np.int64)
        for i in order:
            t = int(ntok[i])
            for p, r in enumerate(room):
                if t <= r:
                    room[p] = r - t
                    pack[i] = p
                    break
            else:
                pack[i] = len(room)
                room.append(max(0, budget - t))
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": ntok,
                "local_pack": pack,
                "part": g["part"].to_numpy(),
            }
        )

    local = (
        parted.groupby("part")
        .map_groups(ffd_part, batch_format="pandas")
        .materialize()
    )
    from ray.data.aggregate import Max as _Max

    n_packs = {
        int(r["part"]): int(r["m"]) + 1
        for r in local.groupby("part")
        .aggregate(_Max("local_pack", alias_name="m"))
        .take_all()
    }
    base, bases = 0, {}
    for p in range(n_parts):
        bases[p] = base
        base += n_packs.get(p, 0)
    bases_ref = ray.put(bases)

    def relabel(b: pa.Table) -> pa.Table:
        bmap = ray.get(bases_ref)
        base_arr = np.array([bmap[p] for p in range(n_parts)], np.int64)
        parts = b["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        local_ids = b["local_pack"].to_numpy(zero_copy_only=False)
        gid = base_arr[parts] + local_ids
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"],
                "pack_id": pa.array(gid, pa.int64()),
            }
        )

    return local.map_batches(relabel, batch_format="pyarrow")


def weighted_sample_topk(
    docs,
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
):
    """Efraimidis–Spirakis (A-ES) weighted sampling without replacement:
    each row draws u from the shared deterministic LCG mix and ranks by
    key = ln(u) / w; the global top-k IS a weight-proportional sample —
    the standard one-pass distributed weighted reservoir. Keys are rounded
    to 9 decimals BEFORE ranking so the SQL mirror (libm ln can differ by
    an ulp across engines) orders identically; ties break on id.

    Scale shape: block-local key computation + block-local top-k prune
    (each block ships at most k (id, w, key) rows into the sort), then
    one distributed sort+limit over the pruned residue. Same int64 LCG
    exactness bound as `train_val_test_split` (doc_id < ~3.4e9)."""
    import numpy as np

    from ..functions.rounding import round_half_away

    def keys(b: pa.Table) -> pa.Table:
        ids = (
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        w = (
            b[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        keep = w > 0
        ids, w = ids[keep], w[keep]
        mix = (ids * 2654435761 + 1013904223) % (2**32)
        u = (mix + 1.0) / 4294967296.0
        key = round_half_away(np.log(u) / w, 9)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                weight_col: pa.array(w[order].astype(np.int64), pa.int64()),
                "sample_key": pa.array(key[order], pa.float64()),
            }
        )

    pruned = docs.map_batches(keys, batch_format="pyarrow")
    return pruned.sort(["sample_key", id_col], descending=[True, False]).limit(k)


def repetition_screen(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_char_max: float = 0.2,
    dup_gram_max: float = 0.6,
):
    """(doc_id, n_grams, top_gram, top_gram_n, top_char_frac, dup_gram_frac,
    rep_ok) — the Gopher REPETITION filters (Rae et al. 2021 appendix A1.1:
    "fraction of characters in the most frequent word 2-gram" and the
    duplicate-2-gram fraction), the companion of the STRUCTURAL rules in
    ``gopher_gates``: template/boilerplate pages repeat themselves long
    before they fail a word-count band.

    Per-doc, block-local (docs never span blocks), one vectorized pass:
    regex split -> flattened token stream with doc indices -> adjacent-pair
    2-grams where both sides share a doc -> one pandas (doc, gram) count ->
    per-doc argmax with (count desc, gram asc) tie-break. No shuffle; the
    only per-row Python is pandas' elementwise string concat for the gram
    join (same cost class as the char-3-gram shingle kernels).

      top_char_frac = top_gram_n * length(top_gram) / length(text)
      dup_gram_frac = (n_grams - n_distinct_grams) / n_grams
      rep_ok        = both rounded fractions within the thresholds

    Fractions are exact int64 ratios evaluated in the identical double op
    order as the SQL mirror, rounded 9dp BEFORE the threshold compare.
    Docs with < 2 tokens emit the (0, '', 0, 0.0, 0.0, true) defaults."""
    import numpy as np
    import pandas as pd

    def screen(b: pa.Table) -> pa.Table:
        n = b.num_rows
        txt = pc.fill_null(b[text_col], "")
        nch = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(txt, r"\s+")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(la), 0).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.int64,
        )
        vals = np.asarray(la.flatten().to_numpy(zero_copy_only=False), dtype=object)
        di = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = vals != ""  # split() edge artifacts; regexp_extract_all drops them
        vals, di = vals[keep], di[keep]

        ng = np.zeros(n, np.int64)
        top_gram = np.full(n, "", dtype=object)
        top_n = np.zeros(n, np.int64)
        ndist = np.zeros(n, np.int64)
        if len(vals) > 1:
            adj = di[:-1] == di[1:]
            if adj.any():
                left = pd.Series(vals[:-1][adj], dtype=object)
                right = pd.Series(vals[1:][adj], dtype=object)
                gdi = di[:-1][adj]
                grams = left.str.cat(right, sep=" ")
                np.add.at(ng, gdi, 1)
                cnt = (
                    pd.DataFrame({"di": gdi, "g": grams.to_numpy()})
                    .groupby(["di", "g"], sort=False)
                    .size()
                    .reset_index(name="n")
                )
                dist = cnt.groupby("di", sort=False).size()
                ndist[dist.index.to_numpy()] = dist.to_numpy()
                top = cnt.sort_values(
                    ["di", "n", "g"],
                    ascending=[True, False, True],
                    kind="stable",
                ).drop_duplicates("di")
                ti = top["di"].to_numpy()
                top_gram[ti] = top["g"].to_numpy()
                top_n[ti] = top["n"].to_numpy()

        glen = np.array([len(g) for g in top_gram], np.int64)
        # identical double op order as the SQL: int64 product -> one division
        tcf = np.divide(
            (top_n * glen).astype(np.float64),
            nch.astype(np.float64),
            out=np.zeros(n, np.float64),
            where=(nch > 0) & (ng > 0),
        )
        dgf = np.divide(
            (ng - ndist).astype(np.float64),
            ng.astype(np.float64),
            out=np.zeros(n, np.float64),
            where=ng > 0,
        )
        tcf = round_half_away(tcf, 9)
        dgf = round_half_away(dgf, 9)
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.array(ng, pa.int64()),
                "top_gram": pa.array(top_gram, pa.string()),
                "top_gram_n": pa.array(top_n, pa.int64()),
                "top_char_frac": pa.array(tcf, pa.float64()),
                "dup_gram_frac": pa.array(dgf, pa.float64()),
                "rep_ok": pa.array(
                    (tcf <= top_char_max) & (dgf <= dup_gram_max)
                ),
            }
        )

    return docs.map_batches(screen, batch_format="pyarrow")


# RE2-compatible on BOTH engines (Arrow's replace_substring_regex and
# DuckDB's regexp_replace are RE2): dialect parity is part of the contract.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM_RE = r"\b\d{9,}\b"


def pii_redact(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, redacted, n_emails, n_ips, n_longnums) — the PII
    anonymization stage every public curation stack runs (C4/Dolma/FineWeb
    mask emails + IP addresses before release): emails -> <EMAIL>, IPv4
    literals -> <IP>, 9+-digit runs (phone/SSN-shaped) -> <NUM>, applied in
    that fixed order so the SQL mirror's nested regexp_replace composes
    identically. Counts are measured on the ORIGINAL text. Pure vectorized
    RE2 kernels per batch (count_substring_regex + replace_substring_regex)
    — no per-row Python, no shuffle."""

    def redact(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b[text_col], "")
        n_email = pc.count_substring_regex(txt, PII_EMAIL_RE).cast(pa.int64())
        n_ip = pc.count_substring_regex(txt, PII_IPV4_RE).cast(pa.int64())
        n_num = pc.count_substring_regex(txt, PII_LONGNUM_RE).cast(pa.int64())
        red = pc.replace_substring_regex(txt, PII_EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_IPV4_RE, "<IP>")
        red = pc.replace_substring_regex(red, PII_LONGNUM_RE, "<NUM>")
        return pa.table(
            {
                id_col: b[id_col],
                "redacted": red,
                "n_emails": n_email,
                "n_ips": n_ip,
                "n_longnums": n_num,
            }
        )

    return docs.map_batches(redact, batch_format="pyarrow")


class _LangConfusionStage:
    """Actor-pool stage: run the langid kernel on the batch and emit
    (gold, pred, n) partial counts — gold and text live in the same row,
    so the confusion matrix needs NO join; profiles build once per actor
    (the LangIdStage state, reused)."""

    def __init__(self):
        self._stage = LangIdStage()

    def __call__(self, b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        pred = self._stage(b)["lang_pred"].to_numpy(zero_copy_only=False)
        gold = b["lang"].to_numpy(zero_copy_only=False)
        cnt = (
            pd.DataFrame({"gold": gold, "pred": pred})
            .groupby(["gold", "pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "gold": pa.array(cnt["gold"].to_numpy(), pa.string()),
                "pred": pa.array(cnt["pred"].to_numpy(), pa.string()),
                "n": pa.array(cnt["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )


def lang_confusion(docs, concurrency: int = 2):
    """(gold, pred, n): confusion matrix of the heuristic language
    identifier against the gold ``lang`` column — the eval harness every
    classifier-gated curation stage needs before its predictions gate real
    data. Per-block (gold, pred) integer partials over the langid actor
    kernel (state per actor, work vectorized); one languages²-bounded
    groupby merges. Rows-only at the driver (the n-gram scorer is not
    SQL-expressible); the planted-fixture pytest pins the kernel."""
    from ray.data.aggregate import Sum

    return (
        docs.map_batches(
            _LangConfusionStage,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
        .groupby(["gold", "pred"])
        .aggregate(Sum("n", alias_name="n"))
    )
