"""Deterministic synthetic web-page corpus with planted duplicate structure.

Implements FIXTURES.md §1: a Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang) plus ground-truth sidecars
``truth_pairs(url_a, url_b, kind)`` and ``truth_clusters(url, cluster_id)``.

Planted structure (all seeded -> byte-identical across runs):
- exact dups: identical text, different url/warc_ts
- near dups: 1-10% token edits (replace/insert/delete)
- prefix dups: one text a >=20-char prefix of the other (0.95 shortcut band)
- span dups: >=250-char shared substring inside otherwise-different pages
- skewed host: one host contributing ~15% of rows of boilerplate-heavy
  near-identical pages (salting/bucket-cap stress)
- non-dups: unique pages incl. low-Jaccard decoys

``html`` embeds the text with entity escaping; extraction must recover the
``text`` column byte-identically (the per-row invariant).
"""

from __future__ import annotations

import html as html_mod
import random
from dataclasses import dataclass, field


@dataclass
class SynthConfig:
    n_docs: int = 2000
    seed: int = 42
    vocab_size: int = 4000
    exact_frac: float = 0.06
    near_frac: float = 0.10
    prefix_frac: float = 0.04
    span_frac: float = 0.04
    skew_frac: float = 0.15
    langs: tuple = ("en", "de", "fr", "es")
    hosts: tuple = tuple(f"site{i}.example.com" for i in range(40))
    skew_host: str = "spam.example.com"
    base_ts: int = 1700000000  # epoch seconds
    epsilon_kinds: dict = field(default_factory=dict)


def _render_html(text: str, title: str) -> bytes:
    body = html_mod.escape(text)
    return (
        f"<html><head><title>{html_mod.escape(title)}</title></head>"
        f"<body><nav>menu home about</nav><p>{body}</p>"
        f"<footer>footer text</footer></body></html>"
    ).encode("utf-8")


def generate_corpus(cfg: SynthConfig | None = None):
    """Returns (pages, truth_pairs, truth_clusters) as lists of tuples:

    pages: (url, warc_ts_epoch, html bytes, text, lang)
    truth_pairs: (url_a, url_b, kind)
    truth_clusters: (url, cluster_id)  — cluster_id = min doc index of group
    """
    cfg = cfg or SynthConfig()
    rng = random.Random(cfg.seed)
    vocab = [f"w{i:04d}" for i in range(cfg.vocab_size)]
    common = ["the", "and", "of", "page", "site", "info"]

    def base_text(n_tokens: int) -> str:
        toks = [
            rng.choice(common) if rng.random() < 0.15 else rng.choice(vocab)
            for _ in range(n_tokens)
        ]
        return " ".join(toks)

    def near_edit(text: str, edit_frac: float) -> str:
        toks = text.split(" ")
        n_edits = max(1, int(len(toks) * edit_frac))
        for _ in range(n_edits):
            op = rng.random()
            i = rng.randrange(len(toks))
            if op < 0.4:
                toks[i] = rng.choice(vocab)
            elif op < 0.7 and len(toks) > 10:
                del toks[i]
            else:
                toks.insert(i, rng.choice(vocab))
        return " ".join(toks)

    pages: list[tuple] = []
    truth_pairs: list[tuple] = []
    cluster_of: dict[int, int] = {}

    def add_page(idx: int, text: str, host: str, lang: str):
        url = f"https://{host}/p/{idx}"
        ts = cfg.base_ts + idx * 17
        pages.append((url, ts, _render_html(text, f"doc {idx}"), text, lang))
        return url

    def plant_cluster(urls_idx: list[int], kind: str):
        root = min(urls_idx)
        for i in urls_idx:
            cluster_of[i] = min(cluster_of.get(i, root), root)
        for i, a in enumerate(urls_idx):
            for b in urls_idx[i + 1 :]:
                truth_pairs.append((f_url(a), f_url(b), kind))

    url_of: dict[int, str] = {}

    def f_url(i: int) -> str:
        return url_of[i]

    idx = 0
    n = cfg.n_docs
    n_skew = int(n * cfg.skew_frac)
    n_exact = int(n * cfg.exact_frac)
    n_near = int(n * cfg.near_frac)
    n_prefix = int(n * cfg.prefix_frac)
    n_span = int(n * cfg.span_frac)

    # --- skewed host: one big boilerplate near-dup cluster ---
    skew_base = base_text(300)
    skew_members = []
    for _ in range(n_skew):
        text = near_edit(skew_base, 0.01)
        lang = "en"
        url_of[idx] = add_page(idx, text, cfg.skew_host, lang)
        skew_members.append(idx)
        idx += 1
    # pair truth for the skew cluster is cluster-level only (quadratic pair
    # list would dominate the fixture); plant a linear sample of pairs
    for a, b in zip(skew_members, skew_members[1:]):
        truth_pairs.append((f_url(a), f_url(b), "skew_near"))
    root = min(skew_members)
    for i in skew_members:
        cluster_of[i] = root

    def rand_host():
        return rng.choice(cfg.hosts)

    def rand_lang():
        return rng.choice(cfg.langs)

    # --- exact-dup clusters (size 2-3) ---
    made = 0
    while made < n_exact:
        size = rng.choice([2, 2, 3])
        text = base_text(rng.randint(80, 500))
        lang = rand_lang()
        members = []
        for _ in range(size):
            url_of[idx] = add_page(idx, text, rand_host(), lang)
            members.append(idx)
            idx += 1
            made += 1
        plant_cluster(members, "exact")

    # --- near-dup clusters (size 2-3, 1-10% edits) ---
    made = 0
    while made < n_near:
        size = rng.choice([2, 2, 3])
        text = base_text(rng.randint(100, 500))
        lang = rand_lang()
        members = []
        for k in range(size):
            t = text if k == 0 else near_edit(text, rng.uniform(0.01, 0.08))
            url_of[idx] = add_page(idx, t, rand_host(), lang)
            members.append(idx)
            idx += 1
            made += 1
        plant_cluster(members, "near")

    # --- prefix dups ---
    made = 0
    while made < n_prefix:
        text = base_text(rng.randint(200, 500))
        cut = rng.randint(len(text) // 3, 2 * len(text) // 3)
        prefix = text[:cut].rstrip()
        lang = rand_lang()
        a, b = idx, idx + 1
        url_of[a] = add_page(a, text, rand_host(), lang)
        url_of[b] = add_page(b, prefix, rand_host(), lang)
        idx += 2
        made += 2
        plant_cluster([a, b], "prefix")

    # --- span dups: long shared substring, otherwise different ---
    made = 0
    while made < n_span:
        span = base_text(60)  # ~300+ chars
        ta = base_text(rng.randint(80, 200))
        tb = base_text(rng.randint(80, 200))
        ca = rng.randrange(max(1, len(ta) - 1))
        cb = rng.randrange(max(1, len(tb) - 1))
        a_text = ta[:ca].rstrip() + " " + span + " " + ta[ca:].lstrip()
        b_text = tb[:cb].rstrip() + " " + span + " " + tb[cb:].lstrip()
        lang = rand_lang()
        a, b = idx, idx + 1
        url_of[a] = add_page(a, a_text, rand_host(), lang)
        url_of[b] = add_page(b, b_text, rand_host(), lang)
        idx += 2
        made += 2
        plant_cluster([a, b], "span")

    # --- unique fillers (incl. low-jaccard decoys) ---
    while idx < n:
        url_of[idx] = add_page(idx, base_text(rng.randint(60, 500)), rand_host(), rand_lang())
        idx += 1

    truth_clusters = [
        (url_of[i], min(c, i)) for i, c in sorted(cluster_of.items())
    ]
    return pages, truth_pairs, truth_clusters


def corpus_dataframes(spark, cfg: SynthConfig | None = None):
    """Materialize the corpus as Spark DataFrames (pages, truth_pairs,
    truth_clusters) with the PAGES_SCHEMA column types."""
    from pyspark.sql import functions as F

    pages, tp, tc = generate_corpus(cfg)
    pages_df = spark.createDataFrame(
        pages, "url string, ts_epoch long, html binary, text string, lang string"
    ).select(
        "url",
        F.timestamp_seconds("ts_epoch").alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    tp_df = spark.createDataFrame(tp, "url_a string, url_b string, kind string")
    tc_df = spark.createDataFrame(tc, "url string, cluster_id long")
    return pages_df, tp_df, tc_df
