"""ES index/component templates: priority resolution, composed_of
merge order, deep merge, _simulate_index."""

import pytest

from telegram2elastic_spark.index import templates as tpl


def _setup(root):
    tpl.put_component_template(
        root, "base-settings",
        {"template": {"settings": {"shards": 4, "replicas": 1}}},
    )
    tpl.put_component_template(
        root, "web-mappings",
        {"template": {"mappings": {"properties": {
            "url": {"type": "keyword"},
            "text": {"type": "text"},
        }}}},
    )
    tpl.put_component_template(
        root, "override-replicas",
        {"template": {"settings": {"replicas": 2}}},
    )
    tpl.put_index_template(
        root, "web", ["web-*"], priority=10,
        composed_of=["base-settings", "web-mappings", "override-replicas"],
        template={"settings": {"refresh": "30s"}},
    )
    tpl.put_index_template(
        root, "catchall", ["*"], priority=0,
        template={"settings": {"shards": 1}},
    )


def test_simulate_merges_in_order(tmp_path):
    root = str(tmp_path)
    _setup(root)
    out = tpl.simulate_index(root, "web-2022.01.01")
    assert out["matched_template"] == "web"
    eff = out["template"]
    # later component overrides earlier (replicas 1 -> 2); own block last
    assert eff["settings"] == {"shards": 4, "replicas": 2, "refresh": "30s"}
    assert eff["mappings"]["properties"]["url"] == {"type": "keyword"}


def test_priority_and_fallback(tmp_path):
    root = str(tmp_path)
    _setup(root)
    out = tpl.simulate_index(root, "events-2022")
    assert out["matched_template"] == "catchall"
    assert out["template"]["settings"] == {"shards": 1}
    assert tpl.simulate_index(root, "web-x")["matched_template"] == "web"


def test_no_match(tmp_path):
    root = str(tmp_path)
    tpl.put_index_template(root, "only-web", ["web-*"], priority=1)
    out = tpl.simulate_index(root, "logs-1")
    assert out == {"matched_template": None, "template": {}}


def test_unknown_component_rejected(tmp_path):
    root = str(tmp_path)
    with pytest.raises(ValueError):
        tpl.put_index_template(
            root, "bad", ["x-*"], composed_of=["missing"]
        )


def test_same_priority_overlap_rejected(tmp_path):
    root = str(tmp_path)
    tpl.put_index_template(root, "a", ["web-*"], priority=5)
    with pytest.raises(ValueError):
        tpl.put_index_template(root, "b", ["web-eu-*"], priority=5)
    # different priority is fine
    tpl.put_index_template(root, "b", ["web-eu-*"], priority=6)
    assert tpl.matching_template(root, "web-eu-1") == "b"


def test_deep_merge_semantics():
    base = {"a": {"x": 1, "y": {"z": 1}}, "list": [1, 2], "s": "old"}
    over = {"a": {"y": {"w": 2}}, "list": [3], "s": "new"}
    out = tpl.deep_merge(base, over)
    assert out["a"] == {"x": 1, "y": {"z": 1, "w": 2}}
    assert out["list"] == [3]  # arrays replaced, not concatenated (ES)
    assert out["s"] == "new"


def test_put_is_atomic_and_idempotent(tmp_path):
    root = str(tmp_path)
    _setup(root)
    # re-PUT with new content replaces
    tpl.put_index_template(
        root, "web", ["web-*"], priority=10,
        composed_of=["base-settings"],
        template={"settings": {"refresh": "5s"}},
    )
    eff = tpl.simulate_index(root, "web-1")["template"]
    assert eff["settings"] == {"shards": 4, "replicas": 1, "refresh": "5s"}
    assert "mappings" not in eff
