"""Multimodal feature kernel: the vectorized Arrow-batch kernel must
reproduce the per-image reference definition (`exact_image_features` over
`decode_payload_stub`) for every row, including edge shapes."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.analytics.multimodal import (
    _MAGIC,
    decode_payload_stub,
    exact_image_features,
    extract_features,
)


def _run_kernel(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(payloads), dtype=np.int64), "payload": payloads}
    )
    out = pd.concat(list(extract_features(iter([pdf]))), ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def _expected(payloads: list[bytes]) -> pd.DataFrame:
    rows = []
    for i, p in enumerate(payloads):
        img = decode_payload_stub(p)
        mean, p99, samples = exact_image_features(img)
        rows.append(
            {
                "doc_id": i,
                "height": img.shape[0],
                "width": img.shape[1],
                "mean_intensity": mean,
                "p99_scaled": p99,
                "frame_samples": ",".join(map(str, samples)),
            }
        )
    return pd.DataFrame(rows)


def _assert_match(payloads: list[bytes]):
    got = _run_kernel(payloads)
    want = _expected(payloads)
    assert got["height"].tolist() == want["height"].tolist()
    assert got["width"].tolist() == want["width"].tolist()
    assert got["mean_intensity"].tolist() == want["mean_intensity"].tolist()
    assert got["p99_scaled"].tolist() == want["p99_scaled"].tolist()
    assert got["frame_samples"].tolist() == want["frame_samples"].tolist()


def test_kernel_matches_reference_basic():
    payloads = [
        _MAGIC + b"hello world, this is a binary payload body",
        _MAGIC + b"x" * 16,
        _MAGIC + b"short",
        _MAGIC + bytes(range(256)),
        _MAGIC,  # empty body → 16×1 zero image
        _MAGIC + b"a" * 553,
    ]
    _assert_match(payloads)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.binary(min_size=0, max_size=700),
        min_size=1,
        max_size=12,
    )
)
def test_kernel_matches_reference_property(bodies):
    _assert_match([_MAGIC + b for b in bodies])
