"""Import the reference Lambda modules (read-only, /root/reference) for
golden-parity testing (SURVEY §5.2-2). We import — never copy — the
pure functions; boto3 (unavailable here) is stubbed before load."""

from __future__ import annotations

import importlib.util
import sys
import types

REF_DIR = "/root/reference"


def _stub_boto3() -> None:
    if "boto3" not in sys.modules:
        stub = types.ModuleType("boto3")
        stub.client = lambda *a, **k: None
        sys.modules["boto3"] = stub


def load_reference_processor():
    _stub_boto3()
    spec = importlib.util.spec_from_file_location(
        "ref_processor", f"{REF_DIR}/ecommerce-order-processor.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
