"""Landing-zone step (SURVEY S1/S6): Spark reads files, not URLs, so
ingestion lands raw payloads under ``landing/<schema>/...`` first.

The reference fetches over HTTP with retry/backoff/rate caps
(SURVEY T6) and unpacks zip/7z in memory
(/root/reference/crawler/frequency.py:34-43,
/root/reference/crawler/vea_industrial_load_profiles.py:40-60).
Here the fetch function is injected (this container has no network —
tests inject a local-file fetcher); unzip goes to the landing dir so
Spark reads the members as a plain partitioned directory (Spark reads
gzip transparently but NOT zip members — explicit extraction stays).
"""

from __future__ import annotations

import os
import shutil
import time
import zipfile
from collections.abc import Callable

from open_energy_data_server_spark.sources import sevenzip

Fetcher = Callable[[str], bytes]


def local_file_fetcher(url: str) -> bytes:
    """Test/offline fetcher: treats the 'URL' as a local path."""
    with open(url, "rb") as f:
        return f.read()


def land(
    url: str,
    landing_dir: str,
    name: str,
    fetcher: Fetcher = local_file_fetcher,
    retries: int = 3,
    backoff_s: float = 0.1,
    unpack: bool = True,
) -> str:
    """Fetch → retry with exponential backoff (2^n, the reference's
    OPEC policy, /root/reference/crawler/opec.py:56-68) → write to the
    landing zone → unpack archives. Returns the path Spark should read
    (a directory for archives, a file otherwise)."""
    os.makedirs(landing_dir, exist_ok=True)
    last_exc: Exception | None = None
    for attempt in range(retries):
        try:
            payload = fetcher(url)
            break
        except Exception as exc:  # noqa: BLE001 — retry any fetch failure
            last_exc = exc
            time.sleep(backoff_s * (2**attempt))
    else:
        raise RuntimeError(f"fetch failed after {retries} attempts: {url}") from last_exc

    target = os.path.join(landing_dir, name)
    with open(target, "wb") as f:
        f.write(payload)

    # single-file compression first: the reference's DWD COSMO monthly
    # files arrive as .grb.bz2 (bz2.decompress before pygrib,
    # /root/reference/crawler/dwd.py:104-115). Spark's text readers
    # handle .gz transparently but binaryFile (the GRIB/shapefile
    # codec path) does not — so both decompress here.
    if unpack and payload[:3] == b"BZh":
        import bz2

        out = target[:-4] if target.endswith(".bz2") else target + ".x"
        with open(out, "wb") as f:
            f.write(bz2.decompress(payload))
        return out
    if unpack and payload[:2] == b"\x1f\x8b":
        import gzip

        out = target[:-3] if target.endswith(".gz") else target + ".x"
        with open(out, "wb") as f:
            f.write(gzip.decompress(payload))
        return out
    if unpack and zipfile.is_zipfile(target):
        extract_dir = target + ".d"
        shutil.rmtree(extract_dir, ignore_errors=True)
        with zipfile.ZipFile(target) as zf:
            zf.extractall(extract_dir)
        return extract_dir
    if unpack and sevenzip.is_7z(payload):
        extract_dir = target + ".d"
        shutil.rmtree(extract_dir, ignore_errors=True)
        root = os.path.realpath(extract_dir)
        for member, content in sevenzip.read_7z(payload).items():
            # members may carry archive-relative subpaths; a fetched
            # archive is untrusted input, so reject absolute or
            # ../-escaping names instead of writing outside the landing
            # dir (zipfile.extractall applies the same containment)
            dest = os.path.realpath(
                os.path.join(root, *member.replace("\\", "/").split("/"))
            )
            if os.path.commonpath([root, dest]) != root:
                raise ValueError(f"7z member escapes extraction dir: {member!r}")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "wb") as mf:
                mf.write(content)
        return extract_dir
    return target
