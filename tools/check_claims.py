r"""Cross-check performance numbers quoted in docs against committed artifacts.

VERDICT rounds 3 and 4 both caught numbers quoted in README/ROADMAP/
PERFORMANCE that no committed JSON contained (the claims/artifact drift).
This tool closes the loop: ``docs/claims.json`` maps every load-bearing
quoted number to the committed artifact field that proves it, and this
checker asserts (a) the number is still literally present in the quoting
docs, and (b) the artifact field still matches it.

Run directly (``python tools/check_claims.py``) or via the quick test tier
(tests/test_doc_claims.py::test_doc_claims_match_committed_artifacts).

Manifest entry schema (docs/claims.json)::

    {
      "claim": "human-readable label",
      "docs": ["README.md", "docs/PERFORMANCE.md"],   # files quoting it
      "quote": "0.3196",          # literal substring expected in each doc
      "artifact": "docs/bench_runs_r05/run1.json",    # committed JSON
      "path": "extra.serving_bundle_chunk.dispatch_ms_per_frame",
      "scale": 1.0,               # optional: artifact value * scale ...
      "tol": 0.0                  # ... must equal float(quote) +- tol
    }

``path`` segments index dicts by key and lists by integer.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve(obj, path):
    for seg in path.split("."):
        if isinstance(obj, list):
            obj = obj[int(seg)]
        else:
            obj = obj[seg]
    return obj


def check_claims(manifest_path=None, repo=REPO):
    r"""Returns a list of failure strings (empty == all claims verified)."""
    manifest_path = manifest_path or os.path.join(repo, "docs",
                                                  "claims.json")
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    failures = []
    artifacts = {}
    for c in manifest["claims"]:
        label = c.get("claim", c["quote"])
        for doc in c["docs"]:
            doc_path = os.path.join(repo, doc)
            try:
                with open(doc_path) as fh:
                    text = fh.read()
            except OSError as e:
                failures.append(f"{label}: doc {doc} unreadable ({e})")
                continue
            if c["quote"] not in text:
                failures.append(
                    f"{label}: quote {c['quote']!r} not found in {doc}")
        art = c["artifact"]
        if art not in artifacts:
            try:
                with open(os.path.join(repo, art)) as fh:
                    artifacts[art] = json.load(fh)
            except (OSError, ValueError) as e:
                artifacts[art] = e
        data = artifacts[art]
        if isinstance(data, Exception):
            failures.append(f"{label}: artifact {art} unreadable ({data})")
            continue
        try:
            value = _resolve(data, c["path"])
        except (KeyError, IndexError, TypeError, ValueError):
            failures.append(
                f"{label}: {art} has no field {c['path']}")
            continue
        if value is None:
            failures.append(f"{label}: {art}:{c['path']} is null")
            continue
        try:
            quoted = float(c["quote"].replace(",", "")
                           .split(" ")[0].rstrip("xkM%"))
        except ValueError:
            continue  # non-numeric quote: presence in docs was the check
        scaled = float(value) * float(c.get("scale", 1.0))
        tol = float(c.get("tol", 0.0)) or abs(quoted) * 0.005 + 1e-12
        if abs(scaled - quoted) > tol:
            failures.append(
                f"{label}: doc quotes {quoted} but {art}:{c['path']} "
                f"= {value} (scaled {scaled:.6g}, tol {tol:.3g})")
    return failures


def main():
    failures = check_claims()
    if failures:
        for f in failures:
            print(f"CLAIM DRIFT: {f}")
        sys.exit(1)
    with open(os.path.join(REPO, "docs", "claims.json")) as fh:
        n = len(json.load(fh)["claims"])
    print(f"all {n} doc claims verified against committed artifacts")


if __name__ == "__main__":
    main()
