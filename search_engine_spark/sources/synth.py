"""Deterministic synthetic corpora (FIXTURES.md §1 and §2).

Two corpora:

- ``pages`` — Common-Crawl-style webtext per BASELINE.json input_hint:
  (url, warc_ts, html, text, lang). Zipfian 30k-word vocabulary (s≈1.07) so
  head-term skew is real at any scale; contractions / hyphenated words /
  dotted tokens / emails / urls / phone numbers injected at fixed rates to
  exercise the analyzers. Rows are a pure function of (doc_id, seed), so the
  corpus is generated ON EXECUTORS via mapInPandas — no driver bottleneck at
  bench scale, identical rows at any parallelism.

- ``docs`` — the reference-test-style 500-row corpus (FIXTURES.md §2) for
  full-DSL tests, generated as plain Python dicts so the pure-Python oracle
  consumes the identical rows.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 30_000
ZIPF_S = 1.07

_CONS = "bcdfghjklmnprstvwz"
_VOW = "aeiou"


def _make_vocab(size: int = VOCAB_SIZE, seed: int = SEED) -> list:
    """Deterministic pseudo-word vocabulary (ASCII, len>=2, unique)."""
    rng = random.Random(seed)
    words, seen = [], set()
    while len(words) < size:
        n_syll = rng.randint(1, 4)
        w = "".join(rng.choice(_CONS) + rng.choice(_VOW)
                    + (rng.choice(_CONS) if rng.random() < 0.3 else "")
                    for _ in range(n_syll))
        if len(w) < 2 or w in seen:
            continue
        seen.add(w)
        words.append(w)
    return words


_VOCAB = None
_ZIPF_CDF = None


def _vocab():
    global _VOCAB, _ZIPF_CDF
    if _VOCAB is None:
        _VOCAB = np.array(_make_vocab(), dtype=object)
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        probs = ranks ** (-ZIPF_S)
        probs /= probs.sum()
        _ZIPF_CDF = np.cumsum(probs)
    return _VOCAB, _ZIPF_CDF


CATEGORIES = ["news", "blog", "shop", "docs", "forum", "wiki",
              "video", "music", "sports", "travel", "health", "tech"]

_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def gen_page_row(doc_id: int, seed: int = SEED) -> dict:
    """Pure function (doc_id, seed) -> pages row."""
    vocab, cdf = _vocab()
    rng = np.random.default_rng(seed * 1_000_003 + doc_id)
    n_tokens = int(rng.integers(50, 401))
    u = rng.random(n_tokens)
    idx = np.searchsorted(cdf, u)
    words = list(vocab[idx])
    # analyzer-exercising injections, ~1 per 20 docs each (FIXTURES §1)
    slot = doc_id % 20
    if slot == 0:
        words.insert(int(rng.integers(0, len(words))), "don't")
        words.insert(int(rng.integers(0, len(words))), "cat's")
    elif slot == 1:
        words.insert(int(rng.integers(0, len(words))),
                     f"{words[0]}-{words[1]}")
    elif slot == 2:
        words.insert(int(rng.integers(0, len(words))),
                     f"{words[0]}.{words[1]}")
    elif slot == 3:
        words.insert(int(rng.integers(0, len(words))),
                     f"user{doc_id}@example{doc_id % 7}.com")
    elif slot == 4:
        words.insert(int(rng.integers(0, len(words))),
                     f"https://site{doc_id % 100}.example/{CATEGORIES[doc_id % 12]}/p{doc_id}")
    elif slot == 5:
        words.insert(int(rng.integers(0, len(words))),
                     f"({100 + doc_id % 900:03d}) {100 + doc_id % 900:03d}-{1000 + doc_id % 9000:04d}")
    text = " ".join(words)
    title = " ".join(words[:5])
    lang = "en" if doc_id % 50 < 49 else ("de" if doc_id % 2 == 0 else "fr")
    url = f"https://site{doc_id % 100}.example/{CATEGORIES[doc_id % 12]}/{doc_id}"
    html = (f"<html><head><title>{title}</title></head>"
            f"<body><p>{text}</p></body></html>").encode("utf-8")
    return {
        "doc_id": doc_id,
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=37 * doc_id),
        "html": html,
        "text": text,
        "lang": lang,
    }


# doc_id is the DENSE surrogate id (0..n-1): doc-aligned posting blocks
# (operators/wand.py) and delta compression need dense ids, and a
# deterministic id keeps rank tie-breaks parallelism-invariant.
PAGES_SCHEMA = ("doc_id long, url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def synth_pages(spark: SparkSession, n_rows: int, seed: int = SEED,
                partitions: int | None = None) -> DataFrame:
    """Generate the pages corpus on executors (deterministic per doc_id)."""

    def gen(batches):
        for pdf in batches:
            rows = [gen_page_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    base = spark.range(n_rows, numPartitions=partitions)
    return base.mapInPandas(gen, PAGES_SCHEMA)


def gen_pages_rows(n_rows: int, seed: int = SEED) -> list:
    """Driver-side twin of synth_pages for the oracle."""
    return [gen_page_row(i, seed) for i in range(n_rows)]


# ---------------------------------------------------------------------------
# docs corpus (FIXTURES.md §2): reference vitest-style fixtures
# ---------------------------------------------------------------------------

_NAME_SEEDS = ["hello", "apple", "application", "appetite", "banana", "cherry",
               "laptop", "phone", "tablet", "camera"]
_NAME_VARIANTS = ["hello", "helo", "hxllo", "hxylzo", "jello", "hell"]
_BRANDS = ["acme", "globex", "initech", "umbrella", "stark", "wayne"]
_STATUSES = ["active", "inactive", "discontinued"]
_TYPES = ["gadget", "tool", "toy", "supply"]
_CUISINES = ["italian", "mexican", "thai", "indian", "french"]
_AUTHORS = ["alice", "bob", "carol", "dave", "erin",
            "frank", "grace", "heidi", "ivan", "judy"]
_TAGS = ["new", "sale", "hot", "eco", "rare", "classic", "limited", "bundle"]
_CITIES = [(40.7128, -74.0060), (51.5074, -0.1278), (35.6762, 139.6503)]
_PHRASE_FILLER = ["jumps", "over", "lazy", "dog", "fence", "gate", "swiftly"]

DOCS_FIELDS = {
    "name": "text", "title": "text", "content": "text",
    "description": "text", "category": "keyword", "status": "keyword",
    "brand": "keyword", "type": "keyword", "cuisine": "keyword",
    "features": "text", "email": "email", "website": "url",
    "phone": "phone", "meta.author": "text", "meta.tags": "text",
    "created": "keyword",
}


def gen_docs_rows(n_rows: int = 500, seed: int = SEED) -> list:
    rng = random.Random(seed)
    vocab, _ = _vocab()
    small_vocab = [str(w) for w in vocab[:300]]
    rows = []
    for n in range(n_rows):
        words = lambda k: " ".join(rng.choice(small_vocab) for _ in range(k))
        # embed the slop-test phrase with 0/1/2-word gaps (FIXTURES §2)
        content_words = [rng.choice(small_vocab) for _ in range(rng.randint(20, 80))]
        if n % 5 == 0:
            gap = (n // 5) % 3
            phrase = ["quick"]
            for w in ["brown", "fox"]:
                phrase += [rng.choice(_PHRASE_FILLER) for _ in range(gap)]
                phrase.append(w)
            pos = rng.randint(0, len(content_words))
            content_words[pos:pos] = phrase
        name_pool = _NAME_VARIANTS + _NAME_SEEDS
        row = {
            "id": f"d{n}",
            "name": " ".join(rng.choice(name_pool)
                             for _ in range(rng.randint(1, 4))),
            "title": words(rng.randint(3, 8)),
            "content": " ".join(content_words),
            "description": words(rng.randint(10, 30)),
            "category": f"cat{n % 8}",
            "status": _STATUSES[n % 3],
            "brand": _BRANDS[n % 6],
            "type": _TYPES[n % 4],
            "cuisine": _CUISINES[n % 5],
            "features": [words(rng.randint(1, 3))
                         for _ in range(rng.randint(0, 3))],
            "price": round(rng.uniform(1, 1000), 2),
            "rating": round(1.0 + 0.1 * rng.randint(0, 40), 1),
            "age": float(rng.randint(18, 80)),
            "location": {
                "lat": _CITIES[n % 3][0] + rng.uniform(-0.5, 0.5),
                "lon": _CITIES[n % 3][1] + rng.uniform(-0.5, 0.5),
            },
            "email": (f"user{n}@example{n % 5}.com" if n % 10 < 3 else None),
            "website": (f"https://shop{n % 20}.example.com/item/{n}"
                        if 3 <= n % 10 < 6 else None),
            "phone": (f"({200 + n % 700:03d}) {200 + n % 700:03d}-{1000 + n % 9000:04d}"
                      if n % 10 >= 8 else None),
            "meta": {
                "author": _AUTHORS[n % 10],
                "tags": [rng.choice(_TAGS) for _ in range(rng.randint(0, 4))],
            },
            "created": (dt.date(2024, 1, 1)
                        + dt.timedelta(days=n % 90)).isoformat(),
        }
        rows.append(row)
    return rows


DOCS_SCHEMA = (
    "id string, name string, title string, content string, "
    "description string, category string, status string, brand string, "
    "type string, cuisine string, features array<string>, price double, "
    "rating double, age double, "
    "location struct<lat: double, lon: double>, email string, "
    "website string, phone string, "
    "meta struct<author: string, tags: array<string>>, created string"
)


def synth_docs(spark: SparkSession, n_rows: int = 500, seed: int = SEED) -> DataFrame:
    rows = gen_docs_rows(n_rows, seed)
    return spark.createDataFrame(rows, DOCS_SCHEMA)
