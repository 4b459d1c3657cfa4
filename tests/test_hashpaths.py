"""Hash → permission-path alias walk (resolve_blob_permission_paths.rs)."""

from __future__ import annotations

from collections import defaultdict

from aruna_spark.queries.hashpaths import blob_permission_paths


def test_alias_groups_ranked_in_walk_order(spark, sf_dir):
    rows = blob_permission_paths(spark, sf_dir).collect()
    assert rows
    groups = defaultdict(list)
    for r in rows:
        groups[r["blob_hash"]].append(r)
    assert any(len(g) > 1 for g in groups.values()), (
        "size-addressed hashes must fan out to multiple aliases"
    )
    for g in groups.values():
        g.sort(key=lambda r: r["rank"])
        # ranks contiguous from 1, and rank order IS the
        # (permission_path, version_id) sort (rs:75-77)
        assert [r["rank"] for r in g] == list(range(1, len(g) + 1))
        keys = [(r["permission_path"], r["version_id"]) for r in g]
        assert keys == sorted(keys)


def test_markers_never_alias(spark, sf_dir):
    df = blob_permission_paths(spark, sf_dir)
    assert df.filter("blob_hash IS NULL").count() == 0
    # every alias path embeds its own bucket/key tail
    rows = df.select("permission_path", "bucket", "key").collect()
    for r in rows:
        assert r["permission_path"].endswith(f"/{r['bucket']}/{r['key']}")
