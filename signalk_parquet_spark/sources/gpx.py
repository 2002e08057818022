"""GPX track import (SURVEY §2.1 S11) — the reference parses GPX with regex
(src/utils/gpx-parser.ts) into DataRecords for navigation.position,
speedOverGround and courseOverGroundTrue (degrees→radians at
gpx-import-service.ts:562-570).

Spark-first: parse on executors via mapInPandas over a file listing (no
driver-side loops), emitting the same DataRecord shape the lake ingests.
Python's stdlib ElementTree replaces the reference's regex scraping.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.time import parse_iso
from ..schema import flatten_value, record_schema

_NS = {"gpx": "http://www.topografix.com/GPX/1/1"}


def parse_gpx_bytes(payload: bytes, context: str = "vessels.gpx-import") -> list[dict]:
    """GPX <trkpt> elements -> DataRecord dicts (position + derived speed and
    course records, deg->rad like the reference)."""
    root = ET.fromstring(payload)
    pts = root.findall(".//gpx:trkpt", _NS) or root.findall(".//trkpt")
    rows: list[dict] = []
    prev: tuple[float, float, datetime] | None = None
    for pt in pts:
        lat, lon = float(pt.get("lat")), float(pt.get("lon"))
        t_el = pt.find("gpx:time", _NS) if pt.find("gpx:time", _NS) is not None else pt.find("time")
        if t_el is None or not t_el.text:
            continue
        ts = parse_iso(t_el.text)
        base = {
            "received_timestamp": ts,
            "signalk_timestamp": ts,
            "context": context,
            "source": '{"label":"gpx-import"}',
            "source_label": "gpx-import",
            "source_type": "gpx",
            "source_pgn": None,
            "source_src": None,
            "meta": None,
        }
        rows.append({**base, "path": "navigation.position",
                     **flatten_value({"latitude": lat, "longitude": lon})})
        if prev is not None:
            plat, plon, pts_ = prev
            dt = (ts - pts_).total_seconds()
            if dt > 0:
                dist = _haversine(plat, plon, lat, lon)
                rows.append({**base, "path": "navigation.speedOverGround",
                             **flatten_value(dist / dt)})
                rows.append({**base, "path": "navigation.courseOverGroundTrue",
                             **flatten_value(math.radians(_bearing(plat, plon, lat, lon)))})
        prev = (lat, lon, ts)
    return rows


def _haversine(lat1, lon1, lat2, lon2) -> float:
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(a))


def _bearing(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2 - lon1)
    y = math.sin(dl) * math.cos(p2)
    x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
    return (math.degrees(math.atan2(y, x)) + 360.0) % 360.0


def import_gpx_files(spark: SparkSession, gpx_paths: list[str], context: str = "vessels.gpx-import") -> DataFrame:
    """Distributed import: the FILE LIST is the DataFrame; each executor
    parses its files (binary read + ET parse) inside mapInPandas."""
    schema = record_schema({"latitude": T.DoubleType(), "longitude": T.DoubleType()})
    files_df = spark.createDataFrame([(p,) for p in gpx_paths], "gpx_path string").repartition(
        min(len(gpx_paths), 32)
    )
    names = [f.name for f in schema.fields]

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for p in pdf["gpx_path"]:
                with open(p, "rb") as fh:
                    rows = parse_gpx_bytes(fh.read(), context)
                out.extend({n: r.get(n) for n in names} for r in rows)
            yield pd.DataFrame(out, columns=names)

    return files_df.mapInPandas(_parse, schema=schema)
