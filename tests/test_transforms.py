"""Ingest-time column transforms (Replayer column_transforms): in-flight
masking before anything lands, across row-image modes."""

import re

import pytest

from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer

MASK = {"text": "regexp_replace(text, '[0-9]', '#')",
        "tool": "upper(tool)"}


def _corpus(tmp_path, **write_kw):
    txns = generate_changelog(
        n_conversations=8, n_extra_ops=20, seed=41, duplicate_txns=2
    )
    write_binlog_files(txns, str(tmp_path / "binlog"), txns_per_file=12, **write_kw)
    return txns


def _masked_oracle(txns):
    df = apply_changelog_oracle(txns)
    df = df.copy()
    df["text"] = df["text"].map(lambda s: re.sub(r"[0-9]", "#", s))
    df["tool"] = df["tool"].map(lambda s: None if s is None else s.upper())
    return df


@pytest.mark.parametrize("row_image", ["full", "minimal"])
def test_transforms_apply_at_ingest(spark, tmp_path, row_image):
    txns = _corpus(tmp_path, row_image=row_image)
    rep = Replayer(
        spark, str(tmp_path / "binlog"), str(tmp_path / "store"),
        row_image=row_image, column_transforms=MASK,
    )
    rep.replay()
    state = (
        rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
    )
    oracle = _masked_oracle(txns)
    assert state["text"].tolist() == oracle["text"].tolist()
    # NULL-preservation: pre-evolution rows have no tool — must stay null
    assert state["tool"].tolist() == oracle["tool"].tolist()
    # raw digits never landed anywhere in the store's snapshots
    assert not state["text"].str.contains(r"[0-9]").any()


def test_transforms_reach_history_and_change_feed(spark, tmp_path):
    txns = _corpus(tmp_path)
    rep = Replayer(
        spark, str(tmp_path / "binlog"), str(tmp_path / "store"),
        column_transforms={"text": "regexp_replace(text, '[0-9]', '#')"},
    )
    rep.replay()
    feed = rep.read_changes().toPandas()
    assert len(feed) and not feed["text"].str.contains(r"[0-9]").any()


def test_key_transform_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="primary-key"):
        Replayer(
            spark, str(tmp_path / "b"), str(tmp_path / "s"),
            column_transforms={"conv_id": "upper(conv_id)"},
        )


def test_unknown_column_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown columns"):
        Replayer(
            spark, str(tmp_path / "b"), str(tmp_path / "s"),
            column_transforms={"nope": "1"},
        )
