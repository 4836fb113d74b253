"""Deterministic synthetic corpus generator (FIXTURES.md).

Everything is seeded (seed=42), no wall-clock, no unseeded randomness,
so golden outputs are stable across runs/machines. Generates:

- ``pages``            (url, warc_ts, html, text, lang)   — BASELINE.json input_hint shape
- ``wiki_corpus``      (doc_id, text, links)              — annotated corpus for P0 store building
- ``redirects``        (src_uri, dst_uri)                 — incl. length-3 chains and one 2-cycle
- ``disambiguations``  (uri)

The html column is a reversible wrapper around text (FIXTURES.md §1.1)
so the byte-identical-extraction invariant is a closed loop:
``extract_text(html) == text`` exactly.

Entity universe: 200 uris ``dbr:Entity_{k}``; 400 surface forms of 1-3
tokens (some nested to exercise longest-match); Zipf-skewed usage (the
top surface form appears in ~20% of docs — the skew driver for salted
aggregation tests).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

SEED = 42
N_ENTITIES = 200
N_SURFACE_FORMS = 400
N_VOCAB = 500
N_REDIRECTS = 25
N_DISAMBIG = 10
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

_BASE_WORDS = (
    "the a of and to in data query table scan join merge sort hash agg "
    "group filter window batch stream row column value key order part line "
    "customer small big fast slow spark vector dup index store count graph "
    "node edge text page link token span model score rank prior context"
).split()


def _vocab() -> list[str]:
    words = list(_BASE_WORDS)
    words += [f"w{i:03d}" for i in range(N_VOCAB - len(words))]
    return words[:N_VOCAB]


def _sf_token_pool() -> list[str]:
    # distinct from vocab so spotting is unambiguous at fixture scale
    return [f"ent{j}" for j in range(150)]


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


@dataclass
class FixtureModel:
    """The seeded 'world' — surface forms, entities, candidate priors."""

    surface_forms: list[tuple[str, ...]] = field(default_factory=list)
    sf_strings: list[str] = field(default_factory=list)
    uris: list[str] = field(default_factory=list)
    # sf index -> list of (uri, weight)
    candidates: dict[int, list[tuple[str, float]]] = field(default_factory=dict)
    sf_weights: np.ndarray | None = None


def build_model(seed: int = SEED) -> FixtureModel:
    rng = np.random.RandomState(seed)
    pool = _sf_token_pool()
    m = FixtureModel()
    m.uris = [f"dbr:Entity_{k}" for k in range(N_ENTITIES)]

    seen: set[tuple[str, ...]] = set()
    while len(m.surface_forms) < N_SURFACE_FORMS:
        ln = int(rng.choice([1, 2, 3], p=[0.4, 0.4, 0.2]))
        toks = tuple(pool[i] for i in rng.randint(0, len(pool), size=ln))
        if toks in seen:
            continue
        seen.add(toks)
        m.surface_forms.append(toks)
        # every 8th sf gets a nested extension (exercises longest-match)
        if len(m.surface_forms) % 8 == 0 and len(toks) < 3:
            ext = toks + (pool[int(rng.randint(0, len(pool)))],)
            if ext not in seen:
                seen.add(ext)
                m.surface_forms.append(ext)
    m.surface_forms = m.surface_forms[:N_SURFACE_FORMS]
    m.sf_strings = [" ".join(t) for t in m.surface_forms]

    ent_pop = _zipf_weights(N_ENTITIES)
    for i in range(N_SURFACE_FORMS):
        k = 1 if rng.rand() < 0.7 else int(rng.randint(2, 6))
        ents = rng.choice(N_ENTITIES, size=k, replace=False, p=ent_pop)
        w = _zipf_weights(k, s=1.5)
        m.candidates[i] = [(m.uris[int(e)], float(wi)) for e, wi in zip(ents, w)]
    m.sf_weights = _zipf_weights(N_SURFACE_FORMS, s=1.05)
    return m


def _gen_doc(
    rng: np.random.RandomState, model: FixtureModel, vocab: list[str]
) -> tuple[str, list[dict]]:
    """One document: text + sf occurrences with exact char offsets."""
    n_slots = int(rng.randint(30, 80))
    toks: list[str] = []
    occs: list[dict] = []  # start, end, surface_form, uri
    pos = 0  # char offset
    for _ in range(n_slots):
        if rng.rand() < 0.22:
            sf_i = int(rng.choice(N_SURFACE_FORMS, p=model.sf_weights))
            sf_toks = model.surface_forms[sf_i]
            start = pos
            for t in sf_toks:
                toks.append(t)
                pos += len(t) + 1
            end = pos - 1
            cands = model.candidates[sf_i]
            uri = cands[
                int(rng.choice(len(cands), p=[w for _, w in cands]))
            ][0]
            occs.append(
                {
                    "start": start,
                    "end": end,
                    "surface_form": model.sf_strings[sf_i],
                    "uri": uri,
                }
            )
        else:
            w = vocab[int(rng.randint(0, len(vocab)))]
            toks.append(w)
            pos += len(w) + 1
    return " ".join(toks), occs


ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]
HTML_PRE = b"<html><head><title>t</title></head><body>"
HTML_POST = b"</body></html>"


def wrap_html(text: str) -> bytes:
    s = text
    for raw, esc in ESCAPES:
        s = s.replace(raw, esc)
    return HTML_PRE + s.encode("utf-8") + HTML_POST


def gen_pages(n_pages: int = 2000, seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §1 — primary input table."""
    model = build_model(seed)
    vocab = _vocab()
    rng = np.random.RandomState(seed + 1)
    base_ts = _dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for i in range(n_pages):
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
        text, _ = _gen_doc(rng, model, vocab)
        rows.append(
            {
                "url": f"https://site{i % 97}.example/{lang}/doc{i}",
                "warc_ts": base_ts + _dt.timedelta(seconds=i),
                "html": wrap_html(text),
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def gen_wiki_corpus(n_wiki: int = 5000, seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §2 — annotated corpus; ~60% of sf occurrences linked."""
    model = build_model(seed)
    vocab = _vocab()
    rng = np.random.RandomState(seed + 2)
    rows = []
    for d in range(n_wiki):
        text, occs = _gen_doc(rng, model, vocab)
        links = [o for o in occs if rng.rand() < 0.6]
        rows.append({"doc_id": d, "text": text, "links": links})
    return pd.DataFrame(rows)


def gen_redirects(seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §3 — 25 edges incl. length-3 chains + one 2-cycle."""
    edges: list[tuple[str, str]] = []
    # chains of length 3: 175->176->177->0, 178->179->180->1, ...
    for c in range(4):
        a, b, cc = 175 + 3 * c, 176 + 3 * c, 177 + 3 * c
        edges.append((f"dbr:Entity_{a}", f"dbr:Entity_{b}"))
        edges.append((f"dbr:Entity_{b}", f"dbr:Entity_{cc}"))
        edges.append((f"dbr:Entity_{cc}", f"dbr:Entity_{c}"))
    # simple single-hop redirects
    for i in range(11):
        edges.append((f"dbr:Entity_{187 + i}", f"dbr:Entity_{10 + i}"))
    # one 2-cycle (must not loop forever)
    edges.append(("dbr:Entity_198", "dbr:Entity_199"))
    edges.append(("dbr:Entity_199", "dbr:Entity_198"))
    return pd.DataFrame(edges[: N_REDIRECTS + 2], columns=["src_uri", "dst_uri"])


def gen_disambiguations(seed: int = SEED) -> pd.DataFrame:
    return pd.DataFrame(
        {"uri": [f"dbr:Entity_{165 + i}" for i in range(N_DISAMBIG)]}
    )


def to_spark(spark, pdf: pd.DataFrame, schema=None):
    return spark.createDataFrame(pdf, schema=schema)
