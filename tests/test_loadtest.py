# SPDX-License-Identifier: Apache-2.0
"""Load-test harness tests: every shipped preset parses and its pipelines
compile; a quick dynamic run against an in-process server creates sessions,
live-tunes gains, and tears down cleanly (reference samples/loadtest/*)."""

import asyncio
import glob
import os

import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.cli.loadtest import LoadTestConfig, run_load_test

PRESETS = sorted(glob.glob("samples/loadtest/*.toml"))


def test_presets_exist():
    names = {os.path.basename(p) for p in PRESETS}
    # the reference's 11 scenarios (samples/loadtest/)
    expected = {
        "dynamic-lt.toml",
        "dynamic-moq-fanout.toml",
        "dynamic-scale-audio-gain.toml",
        "dynamic-tune-heavy.toml",
        "mixed-balanced.toml",
        "oneshot-graph-chain.toml",
        "oneshot-http-passthrough.toml",
        "oneshot-opus-transcode-fast.toml",
        "stress-dynamic.toml",
        "stress-oneshot.toml",
        "ui-demo.toml",
    }
    assert expected <= names


@pytest.mark.parametrize("preset", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_parses_and_pipelines_compile(preset):
    cfg = LoadTestConfig.from_toml(preset)
    assert cfg.scenario in ("oneshot", "dynamic", "mixed")
    paths = list(cfg.dynamic_pipelines)
    if cfg.broadcaster_pipeline:
        paths.append(cfg.broadcaster_pipeline)
    if cfg.oneshot_enabled and cfg.oneshot_pipeline:
        paths.append(cfg.oneshot_pipeline)
        assert os.path.exists(cfg.oneshot_input_file), cfg.oneshot_input_file
    assert paths, f"{preset} references no pipelines"
    for p in paths:
        assert os.path.exists(p), f"{preset}: missing pipeline {p}"
        compile_yaml(open(p).read())


def test_quick_dynamic_loadtest_run():
    """3-second dynamic run against an in-process server: sessions get
    created, gains get tuned, everything tears down."""
    from aiohttp import web

    from streamkit_tpu.server import ServerConfig, create_app

    async def main():
        app = create_app(ServerConfig())
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]

        cfg = LoadTestConfig()
        cfg.server = f"http://127.0.0.1:{port}"
        cfg.scenario = "dynamic"
        cfg.duration_secs = 3.0
        cfg.session_count = 2
        cfg.tune_interval_ms = 200.0
        cfg.dynamic_pipelines = [
            "samples/loadtest/pipelines/dynamic_audio_gain_chain.yml"
        ]
        cfg.real_time_updates = False
        results = await run_load_test(cfg)
        await runner.cleanup()
        return results

    results = asyncio.run(main())
    assert results["dynamic"]["requests"] >= 2
    assert results["dynamic"]["success_rate"] == 1.0, results["dynamic"]
    assert results["tune"]["requests"] >= 2
    assert results["tune"]["success_rate"] == 1.0, results["tune"]


def test_moq_fanout_broadcaster_and_subscribers():
    """The dynamic-moq-fanout scenario shape: one broadcaster session
    publishing lt-live, N subscriber sessions transcoding it (meets at the
    in-process relay; reference samples/loadtest/dynamic-moq-fanout.toml)."""
    from aiohttp import web

    from streamkit_tpu.server import ServerConfig, create_app

    async def main():
        app = create_app(ServerConfig())
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        state = app["state"]

        from streamkit_tpu.cli.client import SkitClient

        async with SkitClient(f"http://127.0.0.1:{port}") as client:
            bc = await client.create_session_http(
                "bcast", open("samples/loadtest/pipelines/moq_broadcaster.yml").read()
            )
            subs = []
            for i in range(3):
                subs.append(
                    await client.create_session_http(
                        f"sub{i}",
                        open("samples/loadtest/pipelines/moq_subscriber_transcode.yml").read(),
                    )
                )
            # let media flow broadcaster → relay → subscribers
            for _ in range(100):
                await asyncio.sleep(0.1)
                b = state.moq_relay.get("lt-live")
                if b is not None and b.frames_published > 20 and b.subscriber_count >= 3:
                    break
            b = state.moq_relay.get("lt-live")
            result = (
                b.frames_published if b else 0,
                b.subscriber_count if b else 0,
            )
            for s in [bc] + subs:
                await client.destroy_session_http(s["session_id"])
        await runner.cleanup()
        return result

    frames, sub_count = asyncio.run(main())
    assert frames > 20, f"broadcaster only published {frames} frames"
    assert sub_count >= 3, f"only {sub_count} subscriber sessions attached"
