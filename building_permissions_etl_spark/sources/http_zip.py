"""S1: HTTP ZIP fetch + extract (reference helpers:22-31).

A driver-side ingest-prep step, not an engine operator: the reference
GETs one national ZIP per run and unpacks it next to the DAG
(`download_and_unpack_zip`, dags/aggregates_python_helpers.py:22-31).
stdlib-only (urllib + zipfile); supports file:// URLs so tests run
offline. At scale the unpacked CSVs land on shared storage and the
engine's CSV source (csv_source.py) scans them distributed.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile


def download_and_unpack_zip(url: str, local_zip_path: str, extract_to_folder: str) -> list[str]:
    """GET ``url`` → ``local_zip_path`` → extractall. Returns the list of
    extracted file paths (reference returns nothing; the list lets the
    caller hand exact paths to spark.read)."""
    os.makedirs(os.path.dirname(local_zip_path) or ".", exist_ok=True)
    os.makedirs(extract_to_folder, exist_ok=True)
    with urllib.request.urlopen(url) as resp, open(local_zip_path, "wb") as out:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    with zipfile.ZipFile(local_zip_path) as zf:
        zf.extractall(extract_to_folder)
        # FILES only: namelist() also contains directory entries, and a
        # caller feeding the list to spark.read would ingest 'data/' AND
        # 'data/a.csv' — reading a.csv twice (or erroring on the dir)
        names = [i.filename for i in zf.infolist() if not i.is_dir()]
    return [os.path.join(extract_to_folder, n) for n in names]
