r"""Doc-claims vs committed-artifacts guard (VERDICT r4 item 8).

Rounds 3 and 4 both shipped performance numbers in README/ROADMAP/
PERFORMANCE that no committed JSON contained. ``docs/claims.json`` maps
every load-bearing quoted number to the committed artifact field that
proves it; this test (quick tier — pure file IO, no jax) asserts the
mapping holds at every commit.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_doc_claims_match_committed_artifacts():
    from check_claims import check_claims

    failures = check_claims()
    assert not failures, "\n".join(failures)


def test_manifest_covers_the_formerly_artifact_free_claims():
    r"""The two claims VERDICT r4 item 2 flagged as artifact-free (six-module
    train_fps, --pallas-serve chunk bundle) must stay in the manifest."""
    import json

    with open(os.path.join(REPO, "docs", "claims.json")) as fh:
        paths = [c["path"] for c in json.load(fh)["claims"]]
    assert any(p.startswith("extra.train_fps") for p in paths)
    assert any(p.startswith("extra.serving_bundle_chunk") for p in paths)
