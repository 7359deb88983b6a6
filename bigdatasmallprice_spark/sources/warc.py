"""Web-crawl ingest: WARC/WET-style record parsing over gzip members.

The entry stage of a crawl-derived training corpus: archives arrive as
concatenated gzip members, each holding one WARC record — version
line, header lines (``Name: value``), blank line, then exactly
``Content-Length`` bytes of payload. This module implements that
format for real with stdlib ``zlib``/``gzip`` — encode AND decode —
so the distributed path exercises genuine decompression + record
framing, not a fake:

- ``encode_warc_gz`` produces a standards-shaped ``.warc.gz`` blob:
  one gzip member per record (the trick that makes WARC splittable —
  a reader can start at any member boundary);
- ``parse_warc_gz`` walks members via zlib's ``unused_data`` handoff,
  parses headers, and slices payloads by Content-Length (never by
  delimiter — binary-safe, exactly like real WARC readers);
- ``warc_records`` runs the parse as one shuffle-free mapInPandas
  stage: archives stay opaque ``binary`` cells, one Arrow batch in,
  one typed record-row batch out.

At 100 TB the same plan holds: archive blobs (or object-store URIs)
are the partition unit, decompression is embarrassingly parallel, and
downstream curation (scrub → dedup → quality) consumes the typed rows
without ever reshuffling payload bytes.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_VERSION = b"WARC/1.0"


def encode_warc_gz(records: list[tuple[dict[str, str], bytes]]) -> bytes:
    """Encode (headers, payload) records as concatenated gzip members —
    one member per record, the splittable layout real crawls use."""
    out = io.BytesIO()
    for headers, payload in records:
        buf = io.BytesIO()
        buf.write(WARC_VERSION + b"\r\n")
        for k, v in headers.items():
            buf.write(f"{k}: {v}\r\n".encode())
        buf.write(f"Content-Length: {len(payload)}\r\n".encode())
        buf.write(b"\r\n")
        buf.write(payload)
        buf.write(b"\r\n\r\n")  # record separator per the WARC spec
        member = io.BytesIO()
        with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
            gz.write(buf.getvalue())
        out.write(member.getvalue())
    return out.getvalue()


def _split_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member's decompressed bytes via zlib unused_data."""
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)  # gzip wrapper
        yield d.decompress(rest)
        rest = d.unused_data


def parse_warc_gz(blob: bytes) -> list[dict]:
    """Parse a .warc.gz blob into records: headers dict + payload bytes.
    Payload is sliced by Content-Length — binary-safe framing."""
    records = []
    for raw in _split_members(blob):
        head, _, body = raw.partition(b"\r\n\r\n")
        lines = head.split(b"\r\n")
        assert lines[0] == WARC_VERSION, "not a WARC record"
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b": ")
            headers[k.decode()] = v.decode()
        n = int(headers["Content-Length"])
        payload = body[:n]
        assert len(payload) == n, "truncated payload"
        records.append({"headers": headers, "payload": payload})
    return records


WARC_RECORD_SCHEMA = (
    "archive_id long, record_idx long, warc_type string, uri string, "
    "content_length long, payload_sum long"
)


def warc_records(archives: DataFrame, id_col: str = "archive_id") -> DataFrame:
    """Distributed WARC parse: one typed row per record, shuffle-free.
    Emits exact integer payload stats so an independent oracle can
    verify byte-correctness end-to-end (gzip round-trip included)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col].astype("int64"), pdf["payload"]):
                for i, rec in enumerate(parse_warc_gz(bytes(blob))):
                    rows.append(
                        {
                            "archive_id": int(aid),
                            "record_idx": i,
                            "warc_type": rec["headers"].get("WARC-Type", ""),
                            "uri": rec["headers"].get("WARC-Target-URI", ""),
                            "content_length": len(rec["payload"]),
                            "payload_sum": sum(rec["payload"]),
                        }
                    )
            yield pd.DataFrame(rows)

    return archives.select(id_col, "payload").mapInPandas(_parse, WARC_RECORD_SCHEMA)


# deterministic synthetic crawl: archive a holds 1 + a % 3 records whose
# payload bytes are a pure integer function of (archive_id, record, i) —
# the closed-form-oracle pattern shared with the WAV/BMP/Y4M synths
WET_BASE_BYTES = 32


def synth_payload(archive_id: int, rec: int) -> bytes:
    n = WET_BASE_BYTES + (archive_id * 7 + rec * 13) % 32
    return bytes((archive_id * 31 + rec * 97 + i * 11) % 256 for i in range(n))


def synthesize_warc(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per doc: a real .warc.gz blob with 1 + doc_id % 3 conversion
    records, shipped as an opaque binary column."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                recs = [
                    (
                        {
                            "WARC-Type": "conversion",
                            "WARC-Target-URI": f"https://example.org/{d}/{r}",
                        },
                        synth_payload(d, r),
                    )
                    for r in range(1 + d % 3)
                ]
                rows.append({"archive_id": d, "payload": encode_warc_gz(recs)})
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(_synth, "archive_id long, payload binary")
