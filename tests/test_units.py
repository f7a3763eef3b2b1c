"""Unit-registry tests (covers the pint subset used by the reference,
cf. reference usage at conductivities.py:29-98, stimulation.py:114-207)."""

import math

import pytest

from fenicsx_beat_tpu.units import Quantity, to_quantity, ureg


def test_basic_parse():
    q = 2.0 * ureg("uA/cm**2")
    assert math.isclose(q.magnitude, 2.0)
    q2 = q.to("uA/mm**2")
    assert math.isclose(q2.magnitude, 0.02)


def test_conductivity_scaling():
    # harmonic-mean scaling used by the Niederer setup
    sigma = 0.17 * ureg("S/m")
    chi = 1400.0 * ureg("cm**-1")
    s = (sigma / chi).to("uA/mV")
    # 0.17 S/m / (140000 1/m) = 1.214e-6 S = 1.214e-6 A/V = 1.214 uA/mV... wait
    # S/m / (1/m) = S ; 0.17/140000 S = 1.2143e-6 A/V = 1.2143e-6 (1e6 uA)/(1e3 mV)
    # = 1.2143e-6 * 1e3 uA/mV = 1.2143e-3 uA/mV
    assert math.isclose(s.magnitude, 0.17 / 140000.0 * 1e3, rel_tol=1e-12)


def test_capacitance():
    C_m = 1.0 * ureg("uF/cm**2")
    assert math.isclose(C_m.to("uF/mm**2").magnitude, 0.01)


def test_equality_across_units():
    assert 1.0 * ureg("m") == 100.0 * ureg("cm")
    assert to_quantity(2.0, "S/m") == 2000.0 * ureg("mS/m")


def test_incompatible_conversion_raises():
    with pytest.raises(ValueError):
        (1.0 * ureg("S/m")).to("uA")


def test_amplitude_over_chi():
    # define_stimulus conversion: (uA/cm^3) / (1/cm) -> uA/cm^2
    A = 50000.0 * ureg("uA/cm**3")
    chi = 1400.0 * ureg("cm**-1")
    amp = (A / chi).to("uA/cm**2").magnitude
    assert math.isclose(amp, 50000.0 / 1400.0)


def test_mesh_unit_conversion():
    assert math.isclose(ureg("mm").to("mm").magnitude, 1.0)
    assert math.isclose((1.5 * ureg("mm")).to("cm").magnitude, 0.15)
