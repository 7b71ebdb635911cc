"""Rule-based event extraction from unstructured document text — the
S11/S16 line-classifier state machine (reference pdf_spider.py:51-118,
document_spider.py:217-253) as an Arrow-batched `mapInPandas` UDTF.

The state machine is inherently sequential per document (one record
accumulates across lines), so this is a legitimate Pandas-UDF case —
but it parallelizes perfectly across documents: each partition's worker
streams its documents independently; no shuffle, no driver involvement.

Also used as the DETERMINISTIC STUB for the LLM extraction path (S17,
transform_data.py:276-385): same input contract ({text,
original_filepath}), same output schema, no API key needed.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference pdf_spider.py:11-18
DATE_PATTERNS = [
    r"(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]*\s+\d{1,2},?\s+\d{4}",
    r"\d{1,2}/\d{1,2}/\d{2,4}",
    r"\d{4}-\d{2}-\d{2}",
]
ADDRESS_KEYWORDS = [
    "street", "st", "avenue", "ave", "road", "rd", "boulevard", "blvd",
    "drive", "dr", "nashville",
]
URL_PATTERN = r"https?://[^\s]+"

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("original_filepath", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("venue_name", T.StringType()),
        T.StructField("venue_address", T.StringType()),
        T.StructField("venue_city", T.StringType()),
        T.StructField("event_date", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _is_date(line: str) -> bool:
    low = line.lower()
    return any(re.search(p, low) for p in DATE_PATTERNS)


def _is_address(line: str) -> bool:
    low = line.lower()
    return any(kw in low for kw in ADDRESS_KEYWORDS)


def _looks_like_name(line: str) -> bool:
    return 5 <= len(line) <= 100 and line[0].isupper()


def extract_events_from_text(text: str) -> list[dict]:
    """Port of the line-classifier state machine (pdf_spider.py:51-118):
    'label: value' lines switch fields; 'venue:'/'name:' labels start a
    new record; free lines classify as url/date/address/name/description.
    """
    lines = [ln.strip() for ln in (text or "").split("\n") if len(ln.strip()) > 3]
    items: list[dict] = []
    current: dict = {}

    def flush():
        if current.get("name"):
            items.append(dict(current))

    for line in lines:
        if ":" in line and not line.startswith("http"):
            label, _, value = line.partition(":")
            label, value = label.strip().lower(), value.strip()
            if label in ("venue", "location", "place", "name"):
                flush()
                current = {"name": value, "venue_name": value}
            elif label in ("address", "venue address"):
                current["venue_address"] = value
            elif label in ("date", "event date", "when"):
                current["event_date"] = value
            elif label in ("website", "url", "web", "link"):
                current["url"] = value
            else:
                current.setdefault("description", []).append(line)
        elif re.search(URL_PATTERN, line):
            current["url"] = line
        elif _is_date(line):
            current["event_date"] = line
        elif _is_address(line):
            current["venue_address"] = line
        elif _looks_like_name(line):
            if current.get("name"):
                current.setdefault("description", []).append(line)
            else:
                current["name"] = line
                current["venue_name"] = line
        else:
            current.setdefault("description", []).append(line)
    flush()

    out = []
    for it in items:
        if isinstance(it.get("description"), list):
            it["description"] = " ".join(it["description"])[:500]  # F17
        name = (it.get("name") or "").strip()
        if len(name) < 3:  # validity gate (pdf_spider.py:119-121)
            continue
        url = (it.get("url") or "").strip()
        if not url or len(url) <= 5:  # F12 synthesis (pdf_spider.py:136-142)
            content = f"{name}|{it.get('venue_address') or 'no-address'}"
            h = hashlib.md5(content.encode()).hexdigest()[:12]
            url = f"pdf://nashville-event/{h}"
        out.append(
            {
                "name": name,
                "venue_name": (it.get("venue_name") or name).strip(),
                "venue_address": (it.get("venue_address") or "").strip() or None,
                "venue_city": "Nashville",
                "event_date": it.get("event_date"),
                "description": it.get("description"),
                "url": url,
                "category": "pdf_extracted",
                "source": "pdf_upload",
            }
        )
    return out


def extract_events_from_word_text(paragraphs: list) -> list[dict]:
    """Port of the WORD paragraph state machine
    (document_spider.py:217-253 _extract_from_word_text) — distinct from
    the PDF machine above: items are separated by blank/short
    paragraphs; 'Key: Value' lines map the key through COLUMN_MAPPINGS
    (_parse_key_value, document_spider.py:303-325; unmapped keys are
    kept raw and dropped later by the item schema); free lines classify
    as url/date/address/name/description (_classify_text_line,
    document_spider.py:327-353)."""
    from nashville_etl_service_backup_spark.schemas import COLUMN_MAPPINGS

    items: list[dict] = []
    current: dict = {}
    for para in paragraphs:
        text = (para or "").strip()
        if not text or len(text) < 3:
            if current.get("name"):
                items.append(dict(current))
                current = {}
            continue
        if ":" in text and not text.startswith("http"):
            key, _, value = text.partition(":")
            key, value = key.strip().lower(), value.strip()
            if key and value:
                std = next(
                    (c for c, alts in COLUMN_MAPPINGS.items() if key in alts),
                    key,
                )
                current[std] = value
        elif re.match(r"https?://", text):
            current["url"] = text
        elif _is_date(text):
            current["event_date"] = text
        elif _is_address(text):
            current["venue_address"] = text
        elif _looks_like_name(text):
            if not current.get("name"):
                current["name"] = text
                current["venue_name"] = text
            else:
                current.setdefault("description", []).append(text)
        else:
            current.setdefault("description", []).append(text)
    if current.get("name"):
        items.append(current)
    for it in items:
        if isinstance(it.get("description"), list):
            it["description"] = " ".join(it["description"])
    return items


def extract_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """UDTF surface (D1): (doc_id, original_filepath, text) → N event
    rows per document, schema-enforced. Arrow batches in/out."""
    id_col = "doc_id" if "doc_id" in docs.columns else None
    path_col = "original_filepath" if "original_filepath" in docs.columns else None
    inp = docs.select(
        (F.col(id_col) if id_col else F.monotonically_increasing_id()).alias(
            "doc_id"
        ),
        (F.col(path_col) if path_col else F.lit(None).cast("string")).alias(
            "original_filepath"
        ),
        F.col(text_col).alias("text"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, path, text in zip(
                pdf["doc_id"], pdf["original_filepath"], pdf["text"]
            ):
                for ev in extract_events_from_text(text):
                    rows.append({"doc_id": doc_id, "original_filepath": path, **ev})
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields]
            )

    return inp.mapInPandas(run, EXTRACTED_SCHEMA)
