"""Fetch the canonical American-college-football network (Girvan &
Newman 2002) and wire it into the fixture loader — one command for the
real-network parity path.

The reference reaches this network through ``graphfamous("football")``
(CommunityDetection.jl test/louvain.jl:497), whose data ships with an
external Julia package rather than the reference repo; this repo's
offline suite uses the statistics-matched ``football_like`` stand-in
(sources/fixtures.py:168) and the exact Newman-GML loader ``load_gml``
(sources/fixtures.py:193). Running this script downloads the canonical
``football.gml`` from Mark Newman's public network-data page, verifies
the published structure (115 teams, 613 games, 12 conferences), pins
the sha256 of the first fetch in a sidecar file for reproducible
re-fetches, and leaves the GML where the parity check below can load
it::

    python scripts/fetch_football.py            # download + verify
    python scripts/fetch_football.py --check    # also run louvain on it

Requires network access (not available in offline CI — which is why the
data is fetched on demand instead of vendored; the GML ships inside a
zip on Newman's page with an academic-citation license note).
"""

from __future__ import annotations

import hashlib
import io
import os
import re
import sys
import urllib.request
import zipfile

URL = "http://www-personal.umich.edu/~mejn/netdata/football.zip"
DEST = os.path.join(os.path.dirname(__file__), os.pardir, "dist",
                    "football.gml")
# published structure of the canonical network (Girvan & Newman, PNAS
# 99:7821, Fig. 5): Division I-A teams and regular-season games, 2000
N_NODES = 115
N_EDGES = 613


def main() -> int:
    dest = os.path.abspath(DEST)
    if not os.path.exists(dest):
        print(f"fetching {URL} ...")
        data = urllib.request.urlopen(URL, timeout=60).read()
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            gml = z.read("football.gml")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as f:
            f.write(gml)
    text = open(dest).read()
    n = len(re.findall(r"node\s*\[", text))
    m = len(re.findall(r"edge\s*\[", text))
    print(f"{dest}\n  {n} nodes / {m} edges "
          f"(expected {N_NODES}/{N_EDGES})")
    ok = (n, m) == (N_NODES, N_EDGES)
    if not ok:
        print("  WARNING: structure differs from the published network —"
              " inspect before use")
    # pin the checksum on first fetch so later re-fetches are
    # reproducible (trust-on-first-use; the sidecar rides next to the
    # data, never in version control)
    digest = hashlib.sha256(open(dest, "rb").read()).hexdigest()
    sidecar = dest + ".sha256"
    if os.path.exists(sidecar):
        pinned = open(sidecar).read().strip()
        print(f"  sha256 {digest} "
              + ("(matches pin)" if pinned == digest
                 else f"— DIFFERS from pinned {pinned}"))
    else:
        with open(sidecar, "w") as f:
            f.write(digest + "\n")
        print(f"  sha256 {digest} (pinned)")
    if "--check" in sys.argv[1:]:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
        from communitydetection_jl_spark.operators.compare import nmi
        from communitydetection_jl_spark.operators.louvain import louvain
        from communitydetection_jl_spark.session import get_spark
        from communitydetection_jl_spark.sources.fixtures import load_gml

        spark = get_spark("football-check", cores=4, shuffle_partitions=4)
        edges, truth = load_gml(spark, dest)
        res = louvain(edges)
        print(f"  louvain: Q={res.quality:.4f} on {edges.count()} edges; "
              f"NMI vs conferences={nmi(res.membership, truth):.4f}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
