"""Keep the driver entry points honest: entry() must stay jittable and
dryrun_multichip must run the full sharded flow on a virtual mesh."""

import importlib.util
import os

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles(graft):
    fn, args = graft.entry()
    jax.jit(fn).lower(*args).compile()


def test_dryrun_multichip(graft):
    graft.dryrun_multichip(4)
