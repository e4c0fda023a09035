"""Phase-1 extraction stage: pages → extracted (text, hrefs, content hash).

The Surfactant analog is ``get_software_entry`` — hash the content,
then fan out to per-type extractors (surfactant/cmd/generate.py:32-123,
surfactant/sbomtypes/_software.py:72-105).  Here it is one
``mapInPandas`` pass over Arrow batches: gzip-sniff, html→text,
href-list, sha256 — all narrow (no shuffle).  Everything downstream
drops the ``html`` blob column immediately, keeping shuffle sizes down.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.extract import (
    extract_hrefs,
    html_to_text,
    maybe_gunzip,
    resolve_href,
    url_host,
)
from ..schema import EXTRACTED_SCHEMA


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts, links, shas, hosts = [], [], [], []
        for b, u in zip(pdf["html"], pdf["url"]):
            content = maybe_gunzip(bytes(b))
            shas.append(hashlib.sha256(content).hexdigest())
            s = content.decode("utf-8", errors="replace")
            texts.append(html_to_text(s))
            # resolve hrefs here (absolute/path/relative forms) so no
            # second Python hop is needed downstream
            resolved = (resolve_href(u, h) for h in extract_hrefs(s))
            links.append([r for r in resolved if r is not None])
            hosts.append(url_host(u))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "content_sha256": shas,
                "text": texts,
                "links": links,
                "host": hosts,
            }
        )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → EXTRACTED_SCHEMA.

    Column-prunes to exactly what extraction needs before the UDF so the
    parquet scan never reads the expected-text oracle column.
    """
    src = pages.select("url", "warc_ts", "html", "lang")
    return src.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
