"""Text analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.  All vectorized (pandas/numpy str kernels); regexes
compile once at module load (per-process — the actor-pool discipline).

Definitions are chosen to be exactly reproducible in ANSI SQL where an
oracle is required (token_count, quality metrics) and documented where not
(langid, fingerprint).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from katydid_haskell_ray.state import sketches as SK

_WS_RE = re.compile(r"\s+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "que"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Number of whitespace-separated non-empty tokens.

    SQL-equivalent: len(list_filter(regexp_split_to_array(text,'\\s+'),
    x -> x <> ''))."""
    return texts.fillna("").str.split().str.len().to_numpy(dtype=np.int64)


# GPT-2-style BPE PRE-tokenizer pattern, simplified to the RE2-compatible
# subset (no lookarounds, no unicode property classes) so the SAME string
# drives Python re AND the DuckDB oracle's regexp_extract_all — the
# "token budget" estimator of an LLM data pipeline without a vocab file.
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_BPE_RE = re.compile(BPE_PRETOKEN_PATTERN)


def subword_count(texts: pd.Series) -> np.ndarray:
    """Number of BPE-pretokenizer pieces per text (vectorized pandas
    str.count over the compiled pattern)."""
    return (texts.fillna("").str.count(_BPE_RE)
            .to_numpy(dtype=np.int64))


def quality_metrics(texts: pd.Series) -> pd.DataFrame:
    """Deterministic quality features (SQL-reproducible arithmetic):

    - n_tokens        whitespace token count
    - n_chars         character count
    - alpha_ratio     alphabetic chars / chars            (round 6)
    - space_ratio     whitespace chars / chars            (round 6)
    - mean_token_len  (n_chars - n_spaces) / n_tokens     (round 6)
    """
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    n_space = t.str.count(r"\s").to_numpy(dtype=np.int64)
    n_tok = token_count(t)
    denom = np.maximum(n_chars, 1)
    return pd.DataFrame({
        "n_tokens": n_tok,
        "n_chars": n_chars,
        "alpha_ratio": np.round(n_alpha / denom, 6),
        "space_ratio": np.round(n_space / denom, 6),
        "mean_token_len": np.round((n_chars - n_space) / np.maximum(n_tok, 1), 6),
    })


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-profile language guess; 'und' (undetermined) when no
    profile scores > 0.  SQL-equivalent: list_intersect of distinct
    lowered tokens against each profile, argmax with first-profile-wins
    ties (langid_docs oracle)."""
    out = []
    for t in texts.fillna(""):
        toks = set(w.lower() for w in t.split())
        best, best_score = "und", 0
        for lang, stop in _LANG_PROFILES.items():
            score = len(toks & stop)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return pd.Series(out, index=texts.index)


def fingerprint64(texts: pd.Series, shingle: int = 4) -> np.ndarray:
    """Order-insensitive 64-bit document fingerprint: xor-fold of character
    n-gram hashes (a rolling-hash-style content fingerprint; two documents
    differing by a reordering of distinct shingles keep distinct prints)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        if len(t) < shingle:
            grams = [t]
        else:
            grams = [t[j:j + shingle] for j in range(len(t) - shingle + 1)]
        if grams:
            out[i] = np.bitwise_xor.reduce(SK.hash64_array(grams))
    return out.view(np.int64)


class TextAnalysisStage:
    """map_batches stage adding langid/quality/token/fingerprint columns."""

    def __init__(self, col: str = "text", with_langid: bool = True,
                 with_fingerprint: bool = True):
        self.col = col
        self.with_langid = with_langid
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.col]
        qm = quality_metrics(t)
        for c in qm.columns:
            batch[c] = qm[c].to_numpy()
        if self.with_langid:
            batch["lang_guess"] = lang_id(t).to_numpy()
        if self.with_fingerprint:
            batch["fingerprint"] = fingerprint64(t)
        return batch


def repetition_metrics(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style intra-document repetition features, fully vectorized:
    all texts in the batch are tokenized once, flattened into ONE token
    array with a doc-index column, and every per-doc statistic is a
    groupby over that flat frame — no per-row Python.

    Columns (SQL-reproducible; see the doc_quality_gopher oracle):
    - n_tokens            whitespace token count
    - n_distinct_tokens   COUNT(DISTINCT token) within the doc
    - top_token_n         occurrences of the single most frequent token
    - n_bigrams           n_tokens - 1 (0 when n_tokens < 2)
    - n_distinct_bigrams  COUNT(DISTINCT adjacent token pair)
    """
    t = texts.fillna("")
    toks = t.str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    n = len(t)
    if n == 0 or int(lens.sum()) == 0:
        z = np.zeros(n, dtype=np.int64)
        return pd.DataFrame({"n_tokens": lens if n else z,
                             "n_distinct_tokens": z, "top_token_n": z,
                             "n_bigrams": z, "n_distinct_bigrams": z})
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = np.concatenate([x for x in toks.to_numpy() if len(x)])
    # token-level: distinct + max frequency per doc via one codes pass
    codes = pd.factorize(flat)[0]
    df = pd.DataFrame({"d": doc_idx, "c": codes})
    per_tok = df.groupby(["d", "c"], sort=False).size()
    g = per_tok.groupby(level=0)
    n_distinct = np.zeros(n, dtype=np.int64)
    top_n = np.zeros(n, dtype=np.int64)
    gs, gm = g.size(), g.max()
    n_distinct[gs.index.to_numpy()] = gs.to_numpy()
    top_n[gm.index.to_numpy()] = gm.to_numpy()
    # bigram-level: adjacent (code, code) pairs within one doc
    same_doc = doc_idx[:-1] == doc_idx[1:]
    bg_doc = doc_idx[:-1][same_doc]
    bg_code = (codes[:-1][same_doc].astype(np.int64) * (codes.max() + 1)
               + codes[1:][same_doc])
    n_bigrams = np.maximum(lens - 1, 0)
    n_distinct_bg = np.zeros(n, dtype=np.int64)
    if len(bg_doc):
        bgu = (pd.DataFrame({"d": bg_doc, "c": bg_code})
               .drop_duplicates().groupby("d").size())
        n_distinct_bg[bgu.index.to_numpy()] = bgu.to_numpy()
    return pd.DataFrame({"n_tokens": lens, "n_distinct_tokens": n_distinct,
                         "top_token_n": top_n, "n_bigrams": n_bigrams,
                         "n_distinct_bigrams": n_distinct_bg})


# PII scan patterns — compiled once per process (actor-pool discipline).
# RE2-compatible (no backrefs/lookarounds) so the DuckDB oracle runs the
# SAME pattern text via regexp_extract_all.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\b555-[0-9]{4}\b",
    "n_ssns": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}
_PII_COMPILED = {k: re.compile(v) for k, v in PII_PATTERNS.items()}


def pii_counts(texts: pd.Series) -> pd.DataFrame:
    """Non-overlapping match counts per PII pattern (str.count ==
    len(regexp_extract_all) — both scan left-to-right non-overlapping)."""
    t = texts.fillna("")
    return pd.DataFrame({k: t.str.count(rx).to_numpy(dtype=np.int64)
                         for k, rx in _PII_COMPILED.items()})


def pii_redact(texts: pd.Series) -> pd.Series:
    """Replace every PII match with a typed tag (applied in PII_PATTERNS
    order, same as chained regexp_replace(..., 'g') in the oracle)."""
    t = texts.fillna("")
    for k, rx in _PII_COMPILED.items():
        t = t.str.replace(rx, f"<{k[2:-1].upper()}>", regex=True)
    return t
