"""Reference-style single-node baseline: the same KG workload executed the
way the reference executes (one thread, pure Python, row-at-a-time — rdflib
+ pandas + awk is single-threaded throughout, BASELINE.md), using the very
same pure-Python functions the engine's tests use as oracles.

Per doc: generate html -> extract_text_py (byte-identical extraction) ->
tokenize -> Aho-Corasick match -> md5-mint one URI per (doc, type, surface)
-> accumulate triples. This is the fairest single-node stand-in we can
construct (the actual reference converts clinical RDF, not web pages), and
it shares ~all inner-loop code with the engine's Python stages.

Prints one JSON line; compare docs/sec against the engine numbers in
BENCH/BASELINE.md ("matches-or-beats the reference's single-node
throughput" goal).
"""

from __future__ import annotations

import hashlib
import json
import re
import time

from rdf_i2b2_converter_spark.config import TOKEN_SPLIT_REGEX
from rdf_i2b2_converter_spark.functions.text import extract_text_py
from rdf_i2b2_converter_spark.operators.mentions import TokenAhoCorasick
from rdf_i2b2_converter_spark.sources import synthetic as syn

N_DOCS = 50_000


def run_proxy(n_docs: int) -> dict:
    """The single-thread reference-style loop — importable so bench.py's
    in-window ratio uses THIS code, not a copy that could drift (review
    r4). Returns wall/docs_per_sec/n_triples."""
    gaz = syn.gen_gazetteer_rows()
    best: dict[str, tuple[str, float]] = {}
    for surface, type_uri, _canon, weight in gaz:
        if surface not in best or weight > best[surface][1]:
            best[surface] = (type_uri, weight)
    ac = TokenAhoCorasick(sorted(best))
    split = re.compile(TOKEN_SPLIT_REGEX)

    t0 = time.time()
    n_triples = 0
    for i in range(n_docs):
        d = syn.gen_doc(i)
        text = extract_text_py(d["html"])
        toks = [t for t in split.split(text.lower()) if t]
        seen: set[str] = set()
        for surface, _b, _e in ac.find(toks):
            seen.add(surface)
        for surface in seen:
            type_uri, _w = best[surface]
            subj = "kg:e/" + hashlib.md5(
                f"{d['url']}|{type_uri}|{surface}".encode()
            ).hexdigest()
            # 3 triples per linked mention (type, mentionedIn, surfaceForm)
            n_triples += 3
            _ = subj
    wall = time.time() - t0
    return {
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_triples": n_triples,
    }


def main() -> None:
    print(json.dumps({"metric": "reference_proxy_single_thread", **run_proxy(N_DOCS)}))


if __name__ == "__main__":
    main()
