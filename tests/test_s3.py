"""Object-store (S3) control-plane tests against an emulated S3 endpoint.

The reference's deployment surface is MinIO-backed S3A
(``Lab2/docker-compose.yml:65-77``, ``incremental_etl_orders.py:55-63``).
These tests run the engine's S3 storage layer — manifest publish,
checkpoint store CRUD, commit-timeline listing — against a REAL HTTP S3
API (moto server), not a mocked client: every request crosses a socket
and exercises boto3's request/response path exactly as MinIO would.

Blocker (documented): the DATA plane (Spark writing parquet to
``s3a://``) needs the hadoop-aws + aws-sdk-bundle jars, which are not in
this image's pyspark distribution — so ``Table`` data writes stay on
local FS here. The control plane is the part that carries the engine's
atomicity claim (manifest-last publish), and that is what runs against
S3 below. ``session.py`` already carries the S3A conf for clusters that
do ship the jars (parity asserted in tests/test_misc.py).
"""

from __future__ import annotations

import json
import os

import pytest

pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.checkpoint import (
    CheckpointStore,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.storage import (
    S3FS,
    read_json,
    write_json,
)

BUCKET = "lake"


@pytest.fixture(scope="module")
def s3_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    old = {
        k: os.environ.get(k)
        for k in (
            "AWS_ENDPOINT_URL",
            "AWS_ACCESS_KEY_ID",
            "AWS_SECRET_ACCESS_KEY",
            "AWS_DEFAULT_REGION",
        )
    }
    os.environ.update(
        AWS_ENDPOINT_URL=endpoint,
        AWS_ACCESS_KEY_ID="test",
        AWS_SECRET_ACCESS_KEY="test",
        AWS_DEFAULT_REGION="us-east-1",
    )
    boto3.client("s3", endpoint_url=endpoint).create_bucket(Bucket=BUCKET)
    yield endpoint
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    server.stop()


@pytest.mark.s3
def test_s3fs_crud_roundtrip(s3_endpoint):
    fs = S3FS(endpoint_url=s3_endpoint)
    p = f"s3a://{BUCKET}/tbl/_commits/00000000000000000001.json"
    assert not fs.exists(p)
    fs.write_text(p, '{"commit": "1"}')
    assert fs.exists(p)
    assert json.loads(fs.read_text(p))["commit"] == "1"
    listing = fs.list(f"s3a://{BUCKET}/tbl/_commits")
    assert p in listing
    fs.delete(p)
    assert not fs.exists(p)
    assert fs.list(f"s3a://{BUCKET}/tbl/_commits") == []


@pytest.mark.s3
def test_manifest_last_publish_on_s3(s3_endpoint):
    """The commit protocol's atomicity claim on object storage: data keys
    first, manifest key last; a reader listing _commits/ never sees a
    commit whose manifest is missing (S3 PUT is atomic per key)."""
    root = f"s3a://{BUCKET}/t1"
    fs = S3FS(endpoint_url=s3_endpoint)
    # simulate the publish order: data objects, then the manifest
    fs.write_text(f"{root}/data/00000000000000000001/part-0.parquet", "fakebytes")
    commits = [p for p in fs.list(f"{root}/_commits") if p.endswith(".json")]
    assert commits == []  # data visible, commit NOT yet published
    manifest = {
        "commit": "00000000000000000001",
        "action": "insert",
        "files_added": [{"path": "data/00000000000000000001/part-0.parquet"}],
        "files_removed": [],
    }
    write_json(f"{root}/_commits/00000000000000000001.json", manifest)
    commits = [p for p in fs.list(f"{root}/_commits") if p.endswith(".json")]
    assert len(commits) == 1
    back = read_json(commits[0])
    assert back["files_added"][0]["path"].startswith("data/")


@pytest.mark.s3
def test_checkpoint_store_on_s3(s3_endpoint):
    """CheckpointStore CRUD against S3 via fs_for's scheme dispatch —
    exactly the reference's AWSS3-backed checkpoint surface
    (incremental_etl_orders.py:66-166)."""
    store = CheckpointStore(f"s3a://{BUCKET}/checkpoints")
    assert store.get("orders") is None
    store.put(
        "orders",
        {
            "last_processed_commit": "00000000000000000007",
            "table_name": "orders",
            "path": f"s3a://{BUCKET}/t1",
            "inserted_time": "2026-01-01T00:00:00Z",
        },
    )
    cp = store.get("orders")
    assert cp["last_processed_commit"] == "00000000000000000007"
    store.put("orders", {**cp, "last_processed_commit": "00000000000000000008"})
    assert store.get("orders")["last_processed_commit"] == "00000000000000000008"
    store.delete("orders")
    assert store.get("orders") is None


@pytest.mark.s3
def test_reference_double_encoded_checkpoint_readable(s3_endpoint):
    """The reference writes json.dumps(json.dumps(...)) checkpoints
    (incremental_etl_orders.py:197-201); the storage shim reads them."""
    fs = S3FS(endpoint_url=s3_endpoint)
    p = f"s3a://{BUCKET}/checkpoints/metadata/legacy.json"
    inner = json.dumps({"last_processed_commit": "5", "table_name": "legacy"})
    fs.write_text(p, json.dumps(inner))  # double-encoded, as the reference does
    assert read_json(p)["last_processed_commit"] == "5"


@pytest.mark.s3
def test_s3fs_move_prefix_does_not_sweep_siblings(s3_endpoint):
    """r13 review: moving an index payload dir must not sweep sibling
    keys sharing the raw prefix (the `secondary_tag_meta.json` next to
    `secondary_tag/`, or a second index `secondary_tagx/`), and moving
    a nonexistent prefix must be a no-op, not a NoSuchKey copy."""
    fs = S3FS(endpoint_url=s3_endpoint)
    root = f"s3a://{BUCKET}/mv/_index"
    fs.write_text(f"{root}/secondary_tag/part-0.parquet", "payload")
    fs.write_text(f"{root}/secondary_tag/part-1.parquet", "payload2")
    fs.write_text(f"{root}/secondary_tag_meta.json", '{"column": "tag"}')
    fs.write_text(f"{root}/secondary_tagx/part-0.parquet", "other")
    fs.move(f"{root}/secondary_tag", f"{root}/secondary_label")
    # payload moved in full
    moved = fs.list(f"{root}/secondary_label/")
    assert len(moved) == 2
    assert fs.list(f"{root}/secondary_tag/") == []
    # siblings untouched
    assert fs.exists(f"{root}/secondary_tag_meta.json")
    assert fs.exists(f"{root}/secondary_tagx/part-0.parquet")
    # empty-prefix move: no-op
    fs.move(f"{root}/nothing_here", f"{root}/elsewhere")
    assert fs.list(f"{root}/elsewhere/") == []
    # single-object move
    fs.move(f"{root}/secondary_tag_meta.json", f"{root}/m2.json")
    assert not fs.exists(f"{root}/secondary_tag_meta.json")
    assert json.loads(fs.read_text(f"{root}/m2.json"))["column"] == "tag"


@pytest.mark.s3
def test_s3fs_mtime_and_size(s3_endpoint):
    """r14 review finding: age-guarded sweeps must read LastModified /
    ContentLength through the fs (an os-level stat returns nothing for
    s3a:// paths, silently no-op'ing vacuum on exactly the store whose
    non-atomic move motivates it); missing keys read None, never 0."""
    import time

    fs = S3FS(endpoint_url=s3_endpoint)
    p = f"s3a://{BUCKET}/mt/obj.json"
    assert fs.mtime(p) is None
    assert fs.size(p) is None
    fs.write_text(p, "x" * 17)
    mt = fs.mtime(p)
    assert mt is not None and abs(time.time() - mt) < 300
    assert fs.size(p) == 17
    fs.delete(p)
