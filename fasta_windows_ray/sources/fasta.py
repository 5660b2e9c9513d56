"""FASTA source: plain-text parser → Ray Dataset of records.

Replaces the reference's bio/needletail readers (fw.rs:62-69,
entropy.rs:104-117). No pre-pass record count is needed (fw.rs:44-53 —
Ray Data's progress accounting subsumes it).
"""

from __future__ import annotations

import pyarrow as pa

RECORD_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("desc", pa.string()),      # "" when absent
    ("seq", pa.string()),
])


def parse_fasta(text: str, truncate_id: bool = False) -> list[tuple[str, str, str]]:
    """(id, desc, seq) triples from FASTA text.

    ``truncate_id=True`` cuts the id at the first space/tab INSIDE the
    full header (the entropy-mode needletail behaviour,
    entropy.rs:109-113); default mode splits id/desc at first whitespace
    like bio::io::fasta.
    """
    records: list[tuple[str, str, str]] = []
    rid, desc, seq_parts = None, "", []
    for line in text.splitlines():
        line = line.rstrip("\r\n")
        if line.startswith(">"):
            if rid is not None:
                records.append((rid, desc, "".join(seq_parts)))
            header = line[1:]
            for cut, ch in enumerate(header):
                if ch in " \t":
                    rid, desc = header[:cut], header[cut + 1:]
                    break
            else:
                rid, desc = header, ""
            if truncate_id:
                desc = ""
            seq_parts = []
        elif line and rid is not None:
            seq_parts.append(line.strip())
    if rid is not None:
        records.append((rid, desc, "".join(seq_parts)))
    return records


def read_fasta(path: str, truncate_id: bool = False):
    """Ray Dataset of FASTA records (id, desc, seq).

    The file is split per record; large genomes stream as one record per
    row and windowing fans out inside map_batches downstream.
    """
    import ray.data as rd

    with open(path) as f:
        records = parse_fasta(f.read(), truncate_id=truncate_id)
    table = pa.table({
        "id": [r[0] for r in records],
        "desc": [r[1] for r in records],
        "seq": [r[2] for r in records],
    }, schema=RECORD_SCHEMA)
    return rd.from_arrow(table)
