"""Unit guards for tools/plan_audit.py's runtime-stage accounting:
the REST base must come from THIS app's uiWebUrl/applicationId, and a
fetch failure must surface (ok=False -> 'n/a' cells + a red flag), never
silently report 0 B."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import plan_audit  # noqa: E402


class _FakeSC:
    def __init__(self, ui, app_id="app-test-123"):
        self.uiWebUrl = ui
        self.applicationId = app_id


class _FakeSpark:
    def __init__(self, ui):
        self.sparkContext = _FakeSC(ui)


def test_stage_totals_surfaces_unreachable_api():
    # closed port: urlopen raises, stage_totals must return ok=False
    shuffle, spill, last, ok = plan_audit.stage_totals(
        _FakeSpark("http://127.0.0.1:1"), start_id=-1
    )
    assert ok is False
    assert (shuffle, spill, last) == (0.0, 0.0, -1)


def test_stages_requires_ui():
    # spark.ui.enabled=false -> uiWebUrl is None -> explicit error, not
    # a hard-coded localhost:4040 fallback
    try:
        plan_audit._stages(_FakeSpark(None))
    except RuntimeError as exc:
        assert "status API" in str(exc)
    else:
        raise AssertionError("expected RuntimeError for disabled UI")


def test_rest_base_is_app_scoped():
    # the fetch URL embeds uiWebUrl AND applicationId (never apps[0]);
    # pin by reading the source, which keeps this a no-network test
    import inspect

    import ast
    import textwrap

    src = inspect.getsource(plan_audit._stages)
    assert "sc.uiWebUrl" in src
    assert "sc.applicationId" in src
    # no literal host anywhere in the CODE (the docstring may mention the
    # anti-pattern) — walk constants, skipping the docstring
    tree = ast.parse(textwrap.dedent(src))
    consts = [
        n.value
        for n in ast.walk(tree)
        if isinstance(n, ast.Constant) and isinstance(n.value, str)
    ]
    code_consts = consts[1:]  # [0] is the docstring
    assert not any("4040" in c for c in code_consts), code_consts
