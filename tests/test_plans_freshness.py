"""PLANS.md staleness guard (VERDICT r8 what's-wrong #3).

PLANS.md advertises itself as the full physical-plan inventory, but it
is a generated artifact — round 8 shipped with its q247 row predating a
query-body change.  tools/gen_plans.py now embeds a hash of the engine
package in the header; this test fails the suite whenever the working
tree drifts from the hash the inventory was generated against, so a
stale inventory can no longer ship silently.  No Spark session needed —
the check is a file hash, not a plan rebuild.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_plans_md_matches_package_sources():
    from gen_plans import catalog_source_hash

    with open(os.path.join(REPO, "PLANS.md")) as f:
        head = f.read(4096)
    m = re.search(r"Source hash: ([0-9a-f]{16})", head)
    assert m, (
        "PLANS.md carries no source-hash line — regenerate it: "
        "python tools/gen_plans.py"
    )
    assert m.group(1) == catalog_source_hash(), (
        "PLANS.md is STALE: the engine package changed since the plan "
        "inventory was generated. Regenerate: python tools/gen_plans.py"
    )
