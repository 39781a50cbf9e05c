"""Documentation completeness: every RunConfig field (i.e. every accepted
parameter) must be documented in doc/parameters/ (reference analogue:
doc/parameters/*.rst documents every user parameter exhaustively)."""

import dataclasses
import os
import re

from concept_tpu.param import RunConfig

DOC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "doc", "parameters")

# internal bookkeeping, not user parameters
INTERNAL = {"param_name", "param_path", "units"}


def _doc_text():
    text = []
    for name in sorted(os.listdir(DOC_DIR)):
        if name.endswith(".md"):
            with open(os.path.join(DOC_DIR, name)) as f:
                text.append(f.read())
    return "\n".join(text)


def test_every_runconfig_field_documented():
    text = _doc_text()
    missing = []
    for f in dataclasses.fields(RunConfig):
        if f.name in INTERNAL:
            continue
        # accept the ASCII name or unicode alias of the field
        pattern = f.name.replace("Delta_", r"(Delta_|Δ)").replace(
            "Omega_", r"(Omega_|Ω)")
        if not re.search(rf"\b{pattern}\b", text):
            missing.append(f.name)
    assert not missing, f"undocumented parameters: {missing}"
