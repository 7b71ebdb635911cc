"""LLM extraction (S17, reference transform_data.py:276-480): text row →
N schema-enforced event rows via an LLM, as a `mapInPandas` UDTF.

Design (SURVEY §7 hard-part 5): the extractor is an injected callable
`text -> list[dict]`; the default is the DETERMINISTIC rule-based stub
(sources.text_extract) so correctness tests never need an API key. A
real client (e.g. google-genai with a JSON response schema, mirroring
transform_data.py:26-43) plugs in behind `make_llm_extractor` — gated
import, never required.

Reference behaviors preserved:
- input truncation to 15,000 chars (transform_data.py:320,421)
- per-item name requirement (transform_data.py:339-341)
- slug-URL synthesis file://{basename}#{i}-{slug} when the LLM returns
  no url (transform_data.py:344-348) — F13
- failure sentinel record "Failed to parse" (transform_data.py:369-385)
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nashville_etl_service_backup_spark.sources.text_extract import (
    extract_events_from_text,
)

MAX_INPUT_CHARS = 15_000  # transform_data.py:320

LLM_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("original_filepath", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("event_date", T.StringType()),
        T.StructField("venue_name", T.StringType()),
        T.StructField("venue_address", T.StringType()),
        T.StructField("venue_city", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("genre", T.StringType()),
        T.StructField("season", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

Extractor = Callable[[str], list[dict]]


def stub_extractor(text: str) -> list[dict]:
    """Deterministic extraction via the rule-based state machine."""
    return extract_events_from_text(text)


def make_llm_extractor(model: str = "gemini-2.5-flash") -> Extractor:
    """Real LLM extractor; requires google-genai + GEMINI_API_KEY. Kept
    behind a gated import — raises ImportError in this container."""
    from google import genai  # noqa: F401  (not installed here by design)

    def extract(text: str) -> list[dict]:  # pragma: no cover
        raise NotImplementedError(
            "LLM client wiring is environment-specific; inject your own "
            "Extractor into extract_with_llm()."
        )

    return extract


def _slug(name: str) -> str:
    return re.sub(r"\W+", "-", name).lower()  # transform_data.py:344


def extract_with_llm(
    docs: DataFrame,
    extractor: Extractor | None = None,
    file_type: str = "pdf",
) -> DataFrame:
    """(original_filepath, text) → exploded event rows, schema-enforced.

    Each worker partition calls the extractor per document; Arrow moves
    batches. Extraction failures yield the reference's sentinel record.
    """
    ex = extractor or stub_extractor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in LLM_EVENT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path, text in zip(pdf["original_filepath"], pdf["text"]):
                basename = os.path.basename(path or "unknown")
                try:
                    events = ex((text or "")[:MAX_INPUT_CHARS])
                except Exception:
                    events = None
                if not events:
                    # sentinel (transform_data.py:369-385)
                    rows.append(
                        {
                            "original_filepath": path,
                            "name": f"Failed to parse: {basename}",
                            "url": f"file://{basename}#error",
                            "description": "Automatic extraction failed",
                            "venue_city": "Nashville",
                            "category": f"{file_type}_extracted",
                            "source": f"{file_type}_upload",
                        }
                    )
                    continue
                for i, ev in enumerate(events):
                    name = (ev.get("name") or "").strip()
                    if not name:  # name requirement
                        continue
                    url = (ev.get("url") or "").strip()
                    if not url:
                        url = f"file://{basename}#{i}-{_slug(name)}"  # F13
                    rows.append(
                        {
                            "original_filepath": path,
                            "name": name,
                            "url": url,
                            "event_date": ev.get("event_date"),
                            "venue_name": ev.get("venue_name"),
                            "venue_address": ev.get("venue_address"),
                            "venue_city": ev.get("venue_city") or "Nashville",
                            "description": ev.get("description"),
                            "category": ev.get("category")
                            or f"{file_type}_extracted",
                            "genre": ev.get("genre"),
                            "season": ev.get("season"),
                            "source": f"{file_type}_upload",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    inp = docs.select("original_filepath", "text")
    return inp.mapInPandas(run, LLM_EVENT_SCHEMA)
