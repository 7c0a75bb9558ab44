#!/usr/bin/env python
"""Run the on-hardware smoke suite (tests/test_tpu_smoke.py) on the
real TPU.

Sets SOLR_TPU_SMOKE=1 so tests/conftest.py skips its CPU pin, then
execs pytest.  Use from the repo root:

    python tools/run_tpu_smoke.py            # smoke tests only
    python tools/run_tpu_smoke.py -k sweep   # subset

First compile through the tunneled TPU takes minutes; the persistent
compilation cache (/tmp/solr_jax_cache_tpu) makes reruns fast.
"""
import os
import sys

os.environ["SOLR_TPU_SMOKE"] = "1"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)
sys.path.insert(0, repo)

import pytest

sys.exit(pytest.main(["tests/test_tpu_smoke.py", "-q", "-x"] + sys.argv[1:]))
