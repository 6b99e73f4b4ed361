r"""MVNX reader parity against the actual reference reader
(articulate/utils/xsens/mvnx_reader.py) on a synthetic full-schema file."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import load_reference

from robustcap_tpu.sensors.mvnx import read_mvnx

SEGMENTS = ["Pelvis", "L5", "Head", "RightForeArm", "LeftForeArm"]
SENSORS = ["Pelvis", "Head", "RightForeArm"]
CONTACTS = ["LeftFoot_Heel", "RightFoot_Heel"]
T = 160   # > 150 calibration frames


def _quat(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _fmt(a):
    return " ".join("%.8f" % v for v in np.asarray(a).reshape(-1))


@pytest.fixture(scope="module")
def mvnx_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    J, I, C = len(SEGMENTS), len(SENSORS), len(CONTACTS)
    seg_xml = "".join(f'<segment id="{i + 1}" label="{l}"/>'
                      for i, l in enumerate(SEGMENTS))
    sen_xml = "".join(f'<sensor label="{l}"/>' for l in SENSORS)
    con_xml = "".join(f'<contactDefinition index="{i}" label="{l}"/>'
                      for i, l in enumerate(CONTACTS))

    def tpose_frame(kind):
        return (f'<frame index="" type="{kind}">'
                f"<orientation>{_fmt(_quat(rng, J))}</orientation>"
                f"<position>{_fmt(rng.normal(size=(J, 3)))}</position>"
                f"</frame>")

    frames = [tpose_frame(k) for k in ("identity", "tpose", "tpose-isb")]
    # joint orientations with a CONSTANT sensor offset so the calibration
    # math has a well-defined answer
    truth = {"jq": [], "iq": []}
    off = _quat(rng, I)
    for t in range(T):
        jq = _quat(rng, J)
        # imu = joint * off^-1  ->  off recovers as imu^-1 * joint
        sel = jq[[SEGMENTS.index(n) for n in SENSORS]]
        inv = off.copy()
        inv[:, 1:] *= -1
        w1, v1 = sel[:, :1], sel[:, 1:]
        w2, v2 = inv[:, :1], inv[:, 1:]
        iq = np.concatenate(
            [w1 * w2 - (v1 * v2).sum(-1, keepdims=True),
             np.cross(v1, v2) + w1 * v2 + w2 * v1], axis=-1)
        truth["jq"].append(jq)
        truth["iq"].append(iq)
        body = "".join([
            f"<orientation>{_fmt(jq)}</orientation>",
            f"<position>{_fmt(rng.normal(size=(J, 3)))}</position>",
            f"<velocity>{_fmt(rng.normal(size=(J, 3)))}</velocity>",
            f"<acceleration>{_fmt(rng.normal(size=(J, 3)))}</acceleration>",
            f"<angularVelocity>{_fmt(rng.normal(size=(J, 3)))}</angularVelocity>",
            f"<angularAcceleration>{_fmt(rng.normal(size=(J, 3)))}</angularAcceleration>",
            f"<footContacts>{_fmt(rng.randint(0, 2, C))}</footContacts>",
            f"<sensorFreeAcceleration>{_fmt(rng.normal(size=(I, 3)))}</sensorFreeAcceleration>",
            f"<sensorMagneticField>{_fmt(rng.normal(size=(I, 3)))}</sensorMagneticField>",
            f"<sensorOrientation>{_fmt(iq)}</sensorOrientation>",
            f"<jointAngle>{_fmt(rng.normal(size=(J, 3)))}</jointAngle>",
            f"<jointAngleXZY>{_fmt(rng.normal(size=(J, 3)))}</jointAngleXZY>",
            f"<jointAngleErgo>{_fmt(rng.normal(size=4))}</jointAngleErgo>",
            f"<jointAngleErgoXZY>{_fmt(rng.normal(size=4))}</jointAngleErgoXZY>",
            f"<centerOfMass>{_fmt(rng.normal(size=3))}</centerOfMass>",
        ])
        frames.append(f'<frame time="{t * 16}" index="{t}" type="normal">'
                      f"{body}</frame>")

    xml = (f'<?xml version="1.0"?><mvnx version="4">'
           f"<comment/><securityCode code=\"x\"/>"
           f'<subject frameRate="60" label="s1">'
           f"<comment/>"
           f"<segments>{seg_xml}</segments>"
           f"<sensors>{sen_xml}</sensors>"
           f"<joints/>"
           f"<ergonomicJointAngles/>"
           f"<footContactDefinition>{con_xml}</footContactDefinition>"
           f"<frames>{''.join(frames)}</frames>"
           f"</subject></mvnx>")
    p = tmp_path_factory.mktemp("mvnx") / "full.mvnx"
    p.write_text(xml)
    return str(p)


def test_full_schema_parity(mvnx_file):
    r"""Every array of the reference reader's output dict — joint kinematics,
    IMU measurements incl. the calibrated orientation, foot contacts, CoM,
    timestamps, tposes — matches, all in the SMPL frame."""
    load_reference()
    from articulate.utils.xsens import read_mvnx as ref_read
    expect = ref_read(mvnx_file)
    got = read_mvnx(mvnx_file)

    assert got["framerate"] == expect["framerate"] == 60
    np.testing.assert_array_equal(got["timestamp ms"],
                                  expect["timestamp ms"].numpy())
    np.testing.assert_allclose(got["center of mass"],
                               expect["center of mass"].numpy(), atol=1e-6)
    assert got["joint"]["name"] == expect["joint"]["name"]
    assert got["imu"]["name"] == expect["imu"]["name"]
    assert got["foot contact"]["name"] == expect["foot contact"]["name"]
    for k in ("orientation", "position", "velocity", "acceleration",
              "angular velocity", "angular acceleration"):
        np.testing.assert_allclose(got["joint"][k],
                                   expect["joint"][k].numpy(), atol=1e-6,
                                   err_msg=f"joint {k}")
    for k in ("orientation", "free acceleration", "magnetic field",
              "calibrated orientation"):
        np.testing.assert_allclose(got["imu"][k],
                                   expect["imu"][k].numpy(), atol=1e-5,
                                   err_msg=f"imu {k}")
    np.testing.assert_allclose(got["foot contact"]["label"],
                               expect["foot contact"]["label"].numpy(),
                               atol=0)
    for t in ("identity", "tpose", "tpose-isb"):
        for k in ("orientation", "position"):
            np.testing.assert_allclose(got["tpose"][t][k],
                                       expect["tpose"][t][k].numpy(),
                                       atol=1e-6, err_msg=f"tpose {t} {k}")


def test_calibrated_orientation_recovers_segment(mvnx_file):
    r"""The synthetic file has imu = joint * off^-1; calibration must map
    sensor orientations back onto their segments' orientations."""
    got = read_mvnx(mvnx_file)
    jq = got["joint"]["orientation"]
    idx = [got["joint"]["name"].index(n) for n in got["imu"]["name"]]
    cal = got["imu"]["calibrated orientation"]
    # quaternion sign gauge: compare |dot| ~ 1
    dots = np.abs((cal * jq[:, idx]).sum(-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)