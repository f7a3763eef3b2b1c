"""ECG tests — mirror of reference ``tests/test_ecg.py``: symmetry and
distance-decay of the recovered extracellular potential, 12-lead algebra
vs hand-computed Wilson terminal, QT detection on the synthetic ECG."""

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


def test_ecg():
    N = 5
    M = 1.0
    C_m = 1.0
    sigma_b = 1.0

    mesh = meshmod.create_unit_square(None, N, N)
    V = fem.functionspace(mesh, ("P", 1))
    v = fem.Function(V)

    ecg = beat.ECGRecovery(v=v, M=M, C_m=C_m, sigma_b=sigma_b)
    p1_ecg = ecg.eval((1.5, 0.5))
    p2_ecg = ecg.eval((10.0, 0.5))
    p3_ecg = ecg.eval((-0.5, 0.5))
    ecg.solve()

    # zero voltage -> zero potential everywhere
    assert np.isclose(fem.assemble_scalar(p1_ecg), 0.0)

    v.interpolate(lambda x: (x[0] - 0.5) ** 2)
    ecg.solve()
    value_p1 = fem.assemble_scalar(p1_ecg)
    value_p2 = fem.assemble_scalar(p2_ecg)
    value_p3 = fem.assemble_scalar(p3_ecg)

    # solution symmetric about x=0.5
    assert np.isclose(value_p1, value_p3)
    # potential decays with distance from the source
    assert abs(value_p2) < abs(value_p1)


def test_ecg_device_electrode_path_matches_lazy_forms():
    """The production path (device-computed electrode weights + warm-started
    solve_device) reproduces the lazy ScalarForm evaluation to roundoff —
    same quadrature rule, same basis tabulation, linearity of the integral."""
    mesh = meshmod.create_unit_square(None, 6, 6)
    V = fem.functionspace(mesh, ("P", 1))
    v = fem.Function(V)
    v.interpolate(lambda x: np.sin(np.pi * x[0]) * x[1])

    ecg = beat.ECGRecovery(v=v, M=1.0)
    points = [(1.5, 0.5), (-0.5, 0.25), (0.5, 2.0)]
    forms = [ecg.eval(p) for p in points]
    ecg.register_electrodes(points)

    ecg.solve()  # syncs host sol for the forms AND keeps the device Im
    expected = np.array([fem.assemble_scalar(f) for f in forms])
    got = ecg.electrode_potentials()
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)

    # warm start: second solve from the first solution converges instantly
    ecg.solve_device()
    assert int(ecg.last_info.iterations) <= 1


def test_12_leads_ecg():
    N = 10
    x = np.ones(N)
    la, ra, ll = 1.2, 4.5, 3.6
    v1, v2, v3, v4, v5, v6 = 1.0, 2.0, 3.0, 4.0, 5.0, 6.0
    Vw = np.mean([la, ra, ll])

    ecg = beat.ecg.Leads12(
        LA=la * x,
        RA=ra * x,
        LL=ll * x,
        V1=v1 * x,
        V2=v2 * x,
        V3=v3 * x,
        V4=v4 * x,
        V5=v5 * x,
        V6=v6 * x,
    )

    for i, vi in enumerate([v1, v2, v3, v4, v5, v6], start=1):
        assert np.allclose(getattr(ecg, f"V{i}_"), vi - Vw)

    # Einthoven identity: I + III = II
    assert np.allclose(ecg.I + ecg.III, ecg.II)
    # Goldberger leads sum to zero
    assert np.allclose(ecg.aVR + ecg.aVL + ecg.aVF, 0.0)


def test_qt_interval():
    qrs_peak_time = 200  # ms
    t_peak_offset_ms = 200
    t_width_ms = 60
    t, y = beat.ecg.example(
        sampling_rate_hz=1000,
        duration_s=1,
        noise_amplitude=0.0,
        wander_amplitude=0.0,
        heart_rate_bpm=60,
        q_offset_ms=40,
        s_offset_ms=40,
        t_peak_offset_ms=t_peak_offset_ms,
        r_width_ms=20,
        q_width_ms=20,
        s_width_ms=30,
        t_width_ms=t_width_ms,
        qrs_peak_time=qrs_peak_time,
    )

    qt = beat.ecg.qt_interval(t=t, ecg_signal=y)

    assert np.isclose(qt.start_index, qrs_peak_time, atol=2)
    assert np.isclose(
        qt.end_index, qrs_peak_time + t_peak_offset_ms + 2 * t_width_ms / 3, atol=5
    )
    assert np.isclose(qt.qt_interval, qt.end_index - qt.start_index)


def _synthetic_ap_train(cl=300.0, apd=(250.0, 230.0, 210.0), dt=0.5):
    """Trapezoid AP train: rest -85, peak +40, 2-sample upstroke, linear
    repolarization reaching rest exactly `apd_k` after activation."""
    n_beats = len(apd)
    T = cl * n_beats + 100.0
    t = np.arange(0.0, T, dt)
    v = np.full(t.size, -85.0)
    for k, a in enumerate(apd):
        t0 = 10.0 + k * cl
        for i, ti in enumerate(t):
            if t0 <= ti < t0 + 1.0:
                v[i] = -85.0 + (ti - t0) * 125.0
            elif t0 + 1.0 <= ti < t0 + a:
                # linear from +40 down to rest at t0 + a
                v[i] = 40.0 - (ti - (t0 + 1.0)) * 125.0 / (a - 1.0)
    return t, v


def test_apd_per_beat_values():
    from fenicsx_beat_tpu.ecg import apd

    t, v = _synthetic_ap_train()
    a = apd(t, v, repolarization=90)
    assert a.size == 3
    # APD90 of the linear-repolarization trapezoid: activation at v=0
    # (upstroke), repol to rest+0.1*(peak-rest) = -72.5 slightly before
    # full rest; analytic within a sample of the nominal plateau lengths
    assert np.all(np.diff(a) < 0)  # shortening train
    for a_k, nominal in zip(a, (250.0, 230.0, 210.0)):
        assert abs(a_k - 0.9 * nominal) < 8.0  # 90% repol of a linear ramp


def test_restitution_curve_pairs():
    from fenicsx_beat_tpu.ecg import restitution_curve

    t, v = _synthetic_ap_train(cl=300.0, apd=(250.0, 230.0, 210.0))
    di, apds = restitution_curve(t, v)
    assert di.size == 2 and apds.size == 2
    # DI_k = CL - APD_k (by construction), APD pairs follow the train
    assert np.all(di > 0) and np.all(np.diff(di) > 0)  # shorter APD -> longer DI
    assert np.all(np.diff(apds) < 0)


def test_apd_on_real_single_cell_trace():
    import jax.numpy as jnp

    from fenicsx_beat_tpu.ecg import apd
    from fenicsx_beat_tpu.models import tentusscher_panfilov_2006 as tp06
    from fenicsx_beat_tpu.odesolver import ODESystemSolver

    dt = 0.1
    n_steps = 4000
    solver = ODESystemSolver(
        fun=tp06.generalized_rush_larsen,
        states=np.tile(tp06.init_state_values()[:, None], (1, 1)),
        parameters=tp06.init_parameter_values(stim_start=10.0),
    )
    vi = tp06.state_index("V")
    tr = np.empty(n_steps)
    tcur = 0.0
    for i in range(n_steps):
        solver.step(tcur, dt)
        tr[i] = float(np.asarray(solver.states)[vi, 0])
        tcur += dt
    a = apd(np.arange(n_steps) * dt, tr, repolarization=90)
    assert a.size >= 1
    assert 150.0 < a[0] < 400.0  # physiological TP06 APD90


def test_restitution_skips_pairs_across_nonrepolarizing_beats():
    from fenicsx_beat_tpu.ecg import apd, restitution_curve

    # beat 2 of 3 repolarizes only to -20 mV (above its APD90 level
    # ~-72.5) before beat 3 re-excites — an incomplete beat in the
    # short-DI regime: no DI pair may span the gap it leaves
    dt = 0.5
    t = np.arange(0.0, 1000.0, dt)

    def ramp(t0, t1, v0, v1, ti):
        return v0 + (ti - t0) * (v1 - v0) / (t1 - t0)

    v = np.full(t.size, -85.0)
    for i, ti in enumerate(t):
        if 10.0 <= ti < 11.0:
            v[i] = ramp(10.0, 11.0, -85.0, 40.0, ti)      # beat 1 upstroke
        elif 11.0 <= ti < 210.0:
            v[i] = ramp(11.0, 210.0, 40.0, -85.0, ti)     # full repol
        elif 300.0 <= ti < 301.0:
            v[i] = ramp(300.0, 301.0, -85.0, 40.0, ti)    # beat 2 upstroke
        elif 301.0 <= ti < 590.0:
            v[i] = ramp(301.0, 590.0, 40.0, -20.0, ti)    # INCOMPLETE repol
        elif 590.0 <= ti < 591.0:
            v[i] = ramp(590.0, 591.0, -20.0, 40.0, ti)    # beat 3 re-excites
        elif 591.0 <= ti < 790.0:
            v[i] = ramp(591.0, 790.0, 40.0, -85.0, ti)    # full repol
    a = apd(t, v)
    assert a.size == 2  # the non-repolarizing beat is dropped
    di, apds = restitution_curve(t, v)
    # beats 1 and 3 are non-consecutive: NO pair may be fabricated
    assert di.size == 0 and apds.size == 0
