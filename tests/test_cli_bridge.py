"""Dataclass → argparse bridge (utils/cli.py), the simple_parsing stand-in
(reference train/sae/sae/__main__.py:155)."""

import argparse
import dataclasses
from typing import List, Literal, Optional

import pytest

from multimodal_sae_tpu.utils.cli import add_dataclass_args, dataclass_from_namespace


@dataclasses.dataclass
class _Inner:
    k: int = 32
    expansion_factor: int = 8
    signed: bool = False


@dataclasses.dataclass
class _Cfg:
    inner: _Inner = dataclasses.field(default_factory=_Inner)
    lr: float = 1e-3
    run_name: Optional[str] = None
    hookpoints: List[str] = dataclasses.field(default_factory=list)
    train_type: Literal["text", "image"] = "text"
    group_size: Literal[64, 128] = 64


def _parse(argv):
    p = argparse.ArgumentParser()
    add_dataclass_args(p, _Cfg)
    return dataclass_from_namespace(_Cfg, p.parse_args(argv))


def test_underscore_and_dash_spellings_both_accepted():
    """The module contract promises underscores → dashes accepted too;
    argparse does not treat them as interchangeable on its own."""
    a = _parse(["--expansion_factor", "16", "--run_name", "x"])
    b = _parse(["--expansion-factor", "16", "--run-name", "x"])
    assert a == b
    assert a.inner.expansion_factor == 16 and a.run_name == "x"


def test_bool_flag_pair():
    assert _parse(["--signed"]).inner.signed is True
    assert _parse(["--no-signed"]).inner.signed is False
    assert _parse([]).inner.signed is False


def test_int_literal_choices_convert_from_argv():
    """Literal with non-string members must convert the argv token before
    the choices check (strings never match int choices)."""
    assert _parse(["--group_size", "128"]).group_size == 128
    assert _parse([]).group_size == 64
    with pytest.raises(SystemExit):
        _parse(["--group_size", "96"])


def test_string_literal_choices():
    assert _parse(["--train_type", "image"]).train_type == "image"
    with pytest.raises(SystemExit):
        _parse(["--train_type", "video"])


def test_lists_and_defaults():
    cfg = _parse(["--hookpoints", "layers.1", "layers.2"])
    assert cfg.hookpoints == ["layers.1", "layers.2"]
    assert cfg.lr == pytest.approx(1e-3)
