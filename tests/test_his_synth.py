"""Scale-shaped HIS inputs (sources.his_synth) through the full
pipeline: schema conformance, non-empty outputs, referential integrity
by construction, and the parallel fecha-partitioned publish layout.

The hand-written fixtures in his_fixtures.py pin SEMANTICS; this file
pins that the same pipeline runs on testdata-scale derived inputs (the
shape bench.py's his_pipeline_publish number measures at sf0.1)."""

from __future__ import annotations

import glob
import os

import pytest

from etl_his_spark import schemas
from etl_his_spark.plans.his_pipeline import run_pipeline
from etl_his_spark.sources.his_synth import his_tables_from_testdata
from etl_his_spark.sources.writers import resolve_current


@pytest.fixture(scope="module")
def synth_tables(spark, sf_dir):
    return his_tables_from_testdata(spark, sf_dir)


@pytest.fixture(scope="module")
def outputs(synth_tables):
    return run_pipeline(synth_tables)


def test_source_schemas_conform(synth_tables):
    for name, df in synth_tables.items():
        want = schemas.HIS_SCHEMAS[name]
        got = {f.name: f.dataType for f in df.schema.fields}
        for f in want.fields:
            assert f.name in got, f"{name}: missing column {f.name}"
            assert got[f.name] == f.dataType, (
                f"{name}.{f.name}: {got[f.name]} != {f.dataType}"
            )


def test_outputs_nonempty_and_typed(outputs):
    targets = {
        "paciente": schemas.PACIENTE,
        "turno": schemas.TURNO,
        "prestacion": schemas.PRESTACION,
        "prestacion_x_turno": schemas.PRESTACION_X_TURNO,
    }
    for name, want in targets.items():
        df = outputs[name]
        assert df.count() > 0, f"{name} empty"
        got = {f.name for f in df.schema.fields}
        assert {f.name for f in want.fields} <= got, name


def test_fk_integrity_by_construction(outputs):
    turno = outputs["turno"]
    pac_ids = outputs["paciente"].select("id")
    orphans = (
        turno.select("paciente_id")
        .join(pac_ids, turno.paciente_id == pac_ids.id, "left_anti")
        .count()
    )
    assert orphans == 0
    bridge = outputs["prestacion_x_turno"]
    pres_ids = outputs["prestacion"].select("id")
    orphans = (
        bridge.join(pres_ids, bridge.prestacion_id == pres_ids.id, "left_anti")
        .count()
    )
    assert orphans == 0


def test_publish_partitioned_one_file_per_mes(synth_tables, tmp_path):
    root = str(tmp_path / "pub")
    run_pipeline(synth_tables, output_root=root)
    current = resolve_current(root)
    # month-grain partition dirs (r11: date-grain exploded into one
    # directory per date — the metastore anti-pattern at 100 TB; month
    # dirs + fecha-sorted row groups give the same day-grain pruning)
    part_dirs = glob.glob(os.path.join(current, "turno", "fecha_mes=*"))
    assert part_dirs, "no fecha_mes partitions written"
    for d in part_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        # the dynamic-partition repartition guarantees one writer task
        # per month → exactly one file per partition at this volume
        assert len(files) == 1, (d, files)
