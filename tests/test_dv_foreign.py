"""Foreign-flavor puffin/DV interop (VERDICT r6 tasks 3 + 6): codec
support on read, run-container bitmaps, and DV-vs-data sequence
ordering — each failure mode flips a visible row or errors.
"""

from __future__ import annotations

import struct

import pytest

from datafusion_iceberg_spark.iceberg.puffin import (
    dv_blob,
    dv_blob_from_bitmap,
    read_dv_positions,
    read_puffin,
    write_puffin,
)
from datafusion_iceberg_spark.iceberg.roaring import deserialize_u64


def _run_bitmap_1_to_5() -> bytes:
    """Hand-crafted portable roaring with a RUN container: positions
    1..5 (cookie 12347, 1 container, 1 run)."""
    return (
        struct.pack("<Q", 1)
        + struct.pack("<I", 0)
        + struct.pack("<I", 12347)
        + b"\x01"
        + struct.pack("<HH", 0, 4)
        + struct.pack("<H", 1)
        + struct.pack("<HH", 1, 4)
    )


def test_run_container_bitmap_decodes():
    assert deserialize_u64(_run_bitmap_1_to_5()) == [1, 2, 3, 4, 5]


def test_compressed_footer_and_blob_roundtrip(tmp_path):
    """lz4-frame footer (spec flag bit 0) + zstd blob payload read back
    to the same positions; offsets/lengths describe the on-disk range."""
    p = str(tmp_path / "c.puffin")
    b1 = dv_blob_from_bitmap(_run_bitmap_1_to_5(), "/d/a.parquet", 5)
    b1.compression_codec = "zstd"
    b2 = dv_blob([2, 4], "/d/b.parquet")  # uncompressed alongside
    written = write_puffin(p, [b1, b2], footer_codec="lz4")
    blobs, _props = read_puffin(p)
    assert [b.compression_codec for b in blobs] == ["zstd", None]
    # zstd payload is smaller on disk than the decompressed frame
    assert blobs[0].length == written[0].length
    got = {
        b.properties["referenced-data-file"]: deserialize_u64(b.data[8:-4])
        for b in blobs
    }
    assert got == {"/d/a.parquet": [1, 2, 3, 4, 5], "/d/b.parquet": [2, 4]}


def test_ranged_read_falls_back_through_footer_for_compressed_blob(tmp_path):
    """The scale path is one ranged read; a compressed foreign blob
    doesn't frame-decode, so the reader parses the footer once to learn
    the codec."""
    p = str(tmp_path / "c.puffin")
    b1 = dv_blob([10, 11, 300], "/d/a.parquet")
    b1.compression_codec = "lz4"
    written = write_puffin(p, [b1], footer_codec="lz4")
    assert read_dv_positions(p, written[0].offset, written[0].length) == [
        10,
        11,
        300,
    ]


def test_unknown_codec_rejected_by_name(tmp_path):
    p = str(tmp_path / "c.puffin")
    b = dv_blob([1], "/d/a.parquet")
    write_puffin(p, [b])
    # patch the footer json to claim an unsupported codec
    raw = open(p, "rb").read()
    patched = raw.replace(
        b'"properties": {"referenced-data-file"',
        b'"compression-codec": "brotli", "properties": {"referenced-data-file"',
    )
    assert patched != raw
    # footer size field must be fixed up
    delta = len(patched) - len(raw)
    (psize,) = struct.unpack_from("<I", raw, len(raw) - 12)
    patched = (
        patched[: len(patched) - 12]
        + struct.pack("<I", psize + delta)
        + patched[len(patched) - 8 :]
    )
    open(p, "wb").write(patched)
    with pytest.raises(ValueError, match="brotli"):
        read_puffin(p)


def test_foreign_dv_scan_gate(spark, sf_dir, duck):
    """The hand-authored foreign v3 fixture (compressed footer, zstd
    blob, run-container bitmap, DV older than its target file,
    scrambled snapshots) scans to the oracle's exact multiset."""
    from datafusion_iceberg_spark.iceberg.queries import (
        iceberg_dv_foreign_scan,
    )
    from datafusion_iceberg_spark.registry import ORACLES

    rows = sorted(
        (int(r["n_nationkey"]), r["n_name"])
        for r in iceberg_dv_foreign_scan(spark, sf_dir).collect()
    )
    exp = sorted(
        (int(a), b)
        for a, b in duck.execute(ORACLES["iceberg_dv_foreign_scan"]).fetchall()
    )
    assert rows == exp and len(rows) == 23
    # the discriminating rows: B's key 0 present TWICE (the stale DV at
    # sequence 2 must not apply to B committed at 3), keys 1-5 gone from
    # A (run-container zstd vector applied)
    keys = [k for k, _ in rows]
    assert keys.count(0) == 2
    assert 5 not in keys and 20 not in keys and 23 not in keys
    assert keys.count(1) == 1  # B's key 1 survives the seq-2 pos delete


def test_writer_emits_run_containers_for_range_deletes():
    """The roaring writer picks the cheaper flavor per container: a
    contiguous range delete serializes as runs (bytes, not kilobyte
    bitmaps) and still roundtrips; sparse sets keep the no-run flavor."""
    import struct as _s

    from datafusion_iceberg_spark.iceberg.roaring import (
        deserialize_u64,
        serialize_u64,
    )

    dense = list(range(1_000_000))
    b = serialize_u64(dense)
    assert len(b) < 300, len(b)  # ~128 KB as bitmap containers
    assert deserialize_u64(b) == dense
    # the 32-bit payload leads with the RUN cookie
    (cookie,) = _s.unpack_from("<I", b, 12)  # after u64 count + u32 high
    assert (cookie & 0xFFFF) == 12347
    sparse = list(range(0, 1 << 16, 17))
    bs = serialize_u64(sparse)
    (cookie2,) = _s.unpack_from("<I", bs, 12)
    assert cookie2 == 12346  # no-run flavor kept when runs don't pay
    assert deserialize_u64(bs) == sparse


def test_write_puffin_compression_codec_property(spark, sf_dir, tmp_path):
    """VERDICT r7 task 5: write.puffin.compression-codec=zstd makes the
    DV write path emit COMPRESSED blobs (footer records the codec, blob
    bytes are not a raw frame), scans stay exact via the foreign-flavor
    footer fallback, and rewrite_deletion_vectors consolidates
    compressed containers correctly (re-encoding, never raw-copying
    compressed bytes)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.puffin import (
        dv_positions,
        read_puffin,
    )
    from datafusion_iceberg_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    cat = Catalog(str(tmp_path / "wh"), name="zdv")
    cat.create_table(
        "z.n",
        nation.schema,
        properties={
            "write.delete.mode": "deletion-vector",
            "write.puffin.compression-codec": "zstd",
        },
    )
    cat.append("z.n", spark, nation.coalesce(1))
    cat.sql(spark, "DELETE FROM zdv.z.n WHERE n_nationkey % 5 = 0")
    cat.sql(spark, "DELETE FROM zdv.z.n WHERE n_nationkey % 7 = 3")

    t = cat.load("z.n")
    dvs = [
        d
        for d in t.position_delete_files()
        if d.referenced_data_file is not None
    ]
    assert dvs
    # the container footer records the codec and the payload is NOT a
    # raw DV frame (ranged read alone cannot decode it)
    path = t.metadata.localize(dvs[0].path)
    blobs, _props = read_puffin(path)
    assert all(b.compression_codec == "zstd" for b in blobs)
    raw = open(path, "rb").read()
    framed = raw[dvs[0].content_offset : dvs[0].content_offset + dvs[0].content_size_in_bytes]
    with pytest.raises(Exception):
        dv_positions(framed)
    # ...but read_puffin hands back decompressed frames that decode
    assert dv_positions(blobs[0].data)

    expected = {
        r.n_nationkey
        for r in nation.collect()
        if r.n_nationkey % 5 != 0 and r.n_nationkey % 7 != 3
    }
    got = {r.n_nationkey for r in t.to_df(spark).collect()}
    assert got == expected

    # consolidation of compressed containers re-encodes correctly
    out = cat.rewrite_deletion_vectors("z.n")
    assert out["containers_after"] == 1
    t2 = cat.load("z.n")
    assert {r.n_nationkey for r in t2.to_df(spark).collect()} == expected
    # rewritten container honors the codec property too
    dvs2 = [
        d
        for d in t2.position_delete_files()
        if d.referenced_data_file is not None
    ]
    blobs2, _ = read_puffin(t2.metadata.localize(dvs2[0].path))
    assert all(b.compression_codec == "zstd" for b in blobs2)


def test_kitchen_sink_fixture_is_structurally_adversarial(spark, sf_dir):
    """The union regression gate only means something if the fixture
    really composes the adversarial surfaces: spec-1 parquet must OMIT
    the partition column, the metadata must be gzip-bytes on disk, and
    the history must span two specs plus eq-delete plus DV manifests."""
    import glob
    import gzip
    import os

    import pyarrow.parquet as papq

    from datafusion_iceberg_spark.iceberg.queries import (
        SCRATCH,
        iceberg_foreign_kitchen_sink_scan,
    )

    iceberg_foreign_kitchen_sink_scan(spark, sf_dir)  # builds the fixture
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(SCRATCH, f"wh_{tag}_kitchensink", "kst")
    # gzip metadata on disk (not a plain-JSON file with a .gz name)
    [mpath] = glob.glob(os.path.join(root, "metadata", "v*.gz.metadata.json"))
    with open(mpath, "rb") as fh:
        head = fh.read(2)
    assert head == b"\x1f\x8b"
    with gzip.open(mpath) as fh:
        import json

        meta = json.loads(fh.read())
    assert meta["format-version"] == 3
    assert {s["spec-id"] for s in meta["partition-specs"]} == {0, 1}
    assert any(
        f["type"] == "timestamp_ns"
        for f in meta["schemas"][0]["fields"]
    )
    # spec-1 data files omit the partition column; spec-0 file has it
    a_cols = papq.read_schema(os.path.join(root, "data", "a.parquet")).names
    b_cols = papq.read_schema(os.path.join(root, "data", "b0.parquet")).names
    assert "n_regionkey" in a_cols and "n_regionkey" not in b_cols
    # both delete flavors present
    assert os.path.exists(os.path.join(root, "data", "eqdel.parquet"))
    assert os.path.exists(os.path.join(root, "data", "dv.puffin"))
