# SPDX-License-Identifier: Apache-2.0
"""Client CLI + load-test harness (skit-cli equivalent)."""

from .client import SkitClient
from .loadtest import LoadTestConfig, Metrics, run_load_test
