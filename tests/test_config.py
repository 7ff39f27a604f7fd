"""Config defaults and layout resolution.

Pins the measured production defaults (BASELINE.md round 3) so they
cannot silently revert: remat="none" for every dataset preset, and
layout="auto" resolving to the fold-2 engine for BOTH model families on
TPU (NDHWC on other platforms).
"""

from __future__ import annotations

import jax
import pytest

from dycon_paper_replication_tpu.config import DATASET_DEFAULTS, make_config


class _FakeTPU:
    platform = "tpu"


class _FakeCPU:
    platform = "cpu"


@pytest.mark.parametrize("dataset", sorted(DATASET_DEFAULTS))
def test_remat_defaults_to_none(dataset):
    # measured on the v5e: folded bf16 activations fit at canonical
    # geometry and remat=none is 14-30% faster (BASELINE.md round 3)
    assert make_config(dataset).remat == "none"


@pytest.mark.parametrize("dataset", sorted(DATASET_DEFAULTS))
def test_flag_parity_fields(dataset):
    cfg = make_config(dataset)
    # reference-parity invariants the trainers rely on
    assert cfg.batch_size >= cfg.labeled_bs
    assert cfg.layout == "auto"


@pytest.mark.parametrize(
    ("model", "expected"),
    [("unet_3D", "folded"), ("vnet", "folded")],
)
def test_auto_layout_resolves_folded_on_tpu(monkeypatch, model, expected):
    monkeypatch.setattr(jax, "devices", lambda: [_FakeTPU()])
    assert make_config("pancreas", model=model).resolved_layout() == expected


def test_auto_layout_resolves_ndhwc_off_tpu(monkeypatch):
    monkeypatch.setattr(jax, "devices", lambda: [_FakeCPU()])
    for model in ("unet_3D", "vnet"):
        assert make_config("pancreas", model=model).resolved_layout() == "NDHWC"


def test_explicit_layout_wins(monkeypatch):
    monkeypatch.setattr(jax, "devices", lambda: [_FakeTPU()])
    assert make_config("pancreas", layout="NCDHW").resolved_layout() == "NCDHW"
