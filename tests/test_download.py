"""Dataset downloader logic (reference ``tools/data/dl_*.py``): selection,
filtering, and dataset layout run hermetically against a local mirror pool;
only the HF byte-fetch needs egress and is gated."""

import json
import subprocess
import sys
from pathlib import Path

import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def _make_mirror(tmp_path, ids):
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    for i in ids:
        Image.new("RGB", (8, 8), (i % 255, 0, 0)).save(mirror / f"{i}.webp")
    return mirror


def _make_metadata_parquet(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tmp_path / "meta.parquet"
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


ROWS = [
    {"id": 1, "created_at": "2021-06-01T10:00:00.000Z",
     "tag_string_meta": "highres", "another_id": [10, 11]},
    {"id": 2, "created_at": "2022-01-01T00:00:00.000Z",
     "tag_string_meta": "highres duplicate", "another_id": [11]},
    {"id": 3, "created_at": "2019-01-01T00:00:00.000Z",
     "tag_string_meta": "", "another_id": None},
    {"id": 4, "created_at": "2023-05-05T12:00:00.000Z",
     "tag_string_meta": "absurdres", "another_id": [12]},
    {"id": 5, "created_at": "2023-06-05T12:00:00.000Z",
     "tag_string_meta": "watermark highres", "another_id": []},
]


def test_filter_posts_parquet_date_and_meta_tags(tmp_path):
    from vision_pt_tpu.data.datapool import filter_posts_parquet

    meta = _make_metadata_parquet(tmp_path, ROWS)
    cache = tmp_path / "cache.parquet"
    table = filter_posts_parquet(meta, "2020-01-01", "2025-12-31", limit=10,
                                 cache_parquet_path=cache)
    ids = sorted(table["id"].to_pylist())
    # 2 excluded (duplicate tag), 3 excluded (date), 5 excluded (watermark)
    assert ids == [1, 4]
    assert cache.exists()
    # whole-token matching: 'absurdres' must not be caught by 'lowres'
    assert 4 in ids


def test_trailing_id_selection():
    from vision_pt_tpu.data.datapool import select_trailing_ids

    r = select_trailing_ids(1000, 10)
    assert list(r) == list(range(990, 1000))
    assert select_trailing_ids(5, 10).start == 1


def test_download_posts_layout_and_resume(tmp_path):
    from vision_pt_tpu.data.datapool import LocalMirrorPool, download_posts

    mirror = _make_mirror(tmp_path, [1, 4, 7])
    posts = {1: {"id": 1, "rating": "g"}, 4: {"id": 4, "rating": "g"},
             9: {"id": 9}}  # 9 missing from the mirror -> skipped
    out = tmp_path / "ds" / "images"
    n = download_posts(LocalMirrorPool(mirror), posts, out)
    assert n == 2
    assert (out / "1.webp").exists() and (out / "4.webp").exists()
    assert json.loads((out / "1.json").read_text())["rating"] == "g"
    # resume: nothing re-fetched
    assert download_posts(LocalMirrorPool(mirror), posts, out) == 0


def test_filter_posts_null_meta_dropped_and_streaming_limit(tmp_path):
    """Pins two reference-parity semantics: NULL tag_string_meta rows are
    dropped (polars Kleene-null filter), and the batch-wise scan honors
    ``limit`` across record-batch boundaries without reading the tail."""
    from vision_pt_tpu.data.datapool import filter_posts_parquet

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        {"id": i, "created_at": f"2022-01-{(i % 27) + 1:02d}T00:00:00.000Z",
         "tag_string_meta": None if i == 3 else "highres"}
        for i in range(1, 60)
    ]
    meta = tmp_path / "meta.parquet"
    # small row groups so iter_batches yields several batches (the limit
    # must truncate across batch boundaries, not just within one)
    pq.write_table(pa.Table.from_pylist(rows), meta, row_group_size=10)
    table = filter_posts_parquet(meta, "2020-01-01", "2025-12-31", limit=100)
    ids = table["id"].to_pylist()
    assert 3 not in ids and len(ids) == 58
    # limit smaller than one batch and spanning batches both truncate
    assert filter_posts_parquet(
        meta, "2020-01-01", "2025-12-31", limit=7
    ).num_rows == 7
    # nothing matches -> empty table with the source schema, still writable
    cache = tmp_path / "empty.parquet"
    empty = filter_posts_parquet(meta, "1990-01-01", "1990-12-31", limit=5,
                                 cache_parquet_path=cache)
    assert empty.num_rows == 0 and cache.exists()


def test_download_posts_backfills_missing_metadata(tmp_path):
    """A crash window can leave an image without its .json; resume must
    treat that id as incomplete and write the metadata."""
    from vision_pt_tpu.data.datapool import LocalMirrorPool, download_posts

    mirror = _make_mirror(tmp_path, [1, 2])
    posts = {1: {"id": 1, "rating": "g"}, 2: {"id": 2, "rating": "s"}}
    out = tmp_path / "ds" / "images"
    out.mkdir(parents=True)
    # simulate the torn state: image 1 present, its json missing
    (out / "1.webp").write_bytes((mirror / "1.webp").read_bytes())
    n = download_posts(LocalMirrorPool(mirror), posts, out)
    assert n == 2  # id 1 re-fetched to backfill, id 2 fresh
    assert json.loads((out / "1.json").read_text())["rating"] == "g"
    # now fully complete -> true no-op
    assert download_posts(LocalMirrorPool(mirror), posts, out) == 0


def test_styled_pair_selection(tmp_path):
    from vision_pt_tpu.data.datapool import select_styled_pair_ids

    meta = _make_metadata_parquet(tmp_path, ROWS)
    images = tmp_path / "imgs"
    images.mkdir()
    Image.new("RGB", (8, 8)).save(images / "11.webp")  # already downloaded
    assert select_styled_pair_ids(meta, images) == [10, 12]


def test_hf_pool_is_an_explicit_gate():
    from vision_pt_tpu.data.datapool import HFDataPool

    with pytest.raises(RuntimeError, match="egress"):
        HFDataPool()


@pytest.mark.slow
def test_download_cli_end_to_end(tmp_path):
    mirror = _make_mirror(tmp_path, [1, 4, 996, 997, 998, 999])
    meta = _make_metadata_parquet(tmp_path, ROWS)

    def run(*args):
        return subprocess.run(
            [sys.executable, "tools/data/download.py", *args],
            capture_output=True, text=True, cwd=REPO, timeout=120,
        )

    out = tmp_path / "sb"
    r = run("safebooru-parquet", "-i", str(meta), "-o", str(out),
            "--mirror", str(mirror))
    assert r.returncode == 0, r.stderr
    assert (out / "cache.parquet").exists()
    assert (out / "images" / "1.webp").exists()
    assert json.loads((out / "images" / "4.json").read_text())["id"] == 4

    out2 = tmp_path / "kona"
    r = run("konachan", "-o", str(out2), "--limit", "5", "--max-id", "1000",
            "--mirror", str(mirror))
    assert r.returncode == 0, r.stderr
    got = sorted(p.name for p in (out2 / "images").iterdir())
    assert got == ["996.webp", "997.webp", "998.webp", "999.webp"]

    # no mirror -> the egress gate fires with the bastion recipe
    r = run("konachan", "-o", str(out2), "--limit", "5")
    assert r.returncode != 0
    assert "egress" in (r.stderr + r.stdout)
