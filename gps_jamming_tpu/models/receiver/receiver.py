"""Full GNSS receiver chain: acquisition -> tracking -> decode -> PVT.

Orchestration equivalent of the reference's per-channel pthread state
machine + sync thread (`sdrmain.c:248-400`, `sdrsync.c:3-208`), re-designed
for TPU execution: the per-thread sequential loops collapse into
  1. ONE batched acquisition kernel over (PRN x Doppler x lag) on device,
  2. ONE `lax.scan` tracking all acquired channels simultaneously on device,
  3. host-side bit/frame decode + pseudorange formation (float64),
  4. host-side WLS PVT at the `outms` cadence (sdrinit.c:111).

The device does the sample-rate work (the 99.9% of FLOPs); the host does
the bit-rate and fix-rate work, exactly the split SURVEY.md §7 prescribes.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AcquisitionConfig, TrackingConfig
from ...ops import codes as codes_ops
from ...ops import cplx
from ...utils import constants as C
from . import acquisition as acq_mod
from . import ephemeris as eph_mod
from . import lnav, observables, pvt, tracking


@dataclasses.dataclass
class ChannelResult:
    prn: int
    acquired: bool
    doppler_hz: float
    code_phase_samples: float
    peak_ratio: float
    cn0_dbhz: float
    obs: observables.ChannelObservables | None = None


@dataclasses.dataclass
class ReceiverResult:
    channels: list[ChannelResult]
    fixes: list[pvt.PvtSolution]
    fix_epochs: list[int]

    @property
    def best_fix(self) -> pvt.PvtSolution | None:
        valid = [f for f in self.fixes if f.valid]
        return valid[-1] if valid else None


def run_receiver(x, sample_rate: float,
                 acq_cfg: AcquisitionConfig | None = None,
                 trk_cfg: TrackingConfig | None = None,
                 max_channels: int = 12,
                 pvt_interval_ms: int = 200,
                 skip_epochs: int = 1000,
                 min_cn0_dbhz: float = 25.0) -> ReceiverResult:
    """Run the complete chain over a capture.

    x: complex ndarray/jax array or CArray baseband at `sample_rate`.
    Returns per-channel status + a PVT fix time series at the 200 ms
    cadence (outms, sdrinit.c:111).
    """
    acq_cfg = acq_cfg or AcquisitionConfig()
    trk_cfg = trk_cfg or TrackingConfig()
    xp = cplx.asarray(x)
    n = xp.shape[-1]
    n_code = int(round(sample_rate * C.GPS_CA_PERIOD_S))

    # --- 1. batched acquisition over all 32 PRNs -------------------------
    n_intg = acq_cfg.n_integration
    blocks = cplx.apply(
        lambda a: a[: n_intg * n_code].reshape(n_intg, n_code), xp)
    replica = acq_mod.gps_replica_table_host(sample_rate, n_code)
    res = acq_mod.acquire_all(blocks, replica, sample_rate, acq_cfg)
    acquired = np.asarray(res.acquired)
    ratios = np.asarray(res.peak_ratio)
    order = np.argsort(-ratios)
    sel = [int(i) for i in order if acquired[i]][:max_channels]

    channels = [ChannelResult(
        prn=i + 1, acquired=bool(acquired[i]),
        doppler_hz=float(np.asarray(res.doppler_hz)[i]),
        code_phase_samples=float(np.asarray(res.code_phase)[i]),
        peak_ratio=float(ratios[i]),
        cn0_dbhz=float(np.asarray(res.cn0_dbhz)[i]))
        for i in range(acquired.size)]
    if not sel:
        return ReceiverResult(channels, [], [])

    # --- 2. one batched tracking scan for all selected channels ----------
    table = np.stack([codes_ops.gps_ca_code(i + 1) for i in sel])
    step, run, n_epoch = tracking.make_tracker(table, sample_rate, trk_cfg)
    st = tracking.init_state(
        len(sel),
        np.array([channels[i].doppler_hz for i in sel], np.float32),
        np.array([channels[i].code_phase_samples for i in sel], np.float32),
        sample_rate)
    _, outs = jax.jit(lambda s, d: run(s, d))(st, xp)
    ip = np.asarray(outs.i_prompt)          # (n_epochs, n_ch)
    rem = np.asarray(outs.code_rem_chips)
    cf = np.asarray(outs.carr_freq_hz)
    cn0 = np.asarray(outs.cn0_dbhz)
    n_epochs = ip.shape[0]

    # --- 3. host decode per channel --------------------------------------
    live: list[observables.ChannelObservables] = []
    for c, i in enumerate(sel):
        if np.median(cn0[-200:, c]) < min_cn0_dbhz:
            continue
        obs = observables.build_channel_observables(
            prn=i + 1, i_prompt=ip[:, c], code_rem=rem[:, c],
            carr_freq=cf[:, c], cn0=cn0[:, c], skip_epochs=skip_epochs)
        channels[i].obs = obs
        if obs is not None and obs.eph.complete:
            live.append(obs)

    # --- 4. PVT at the measurement cadence -------------------------------
    fixes: list[pvt.PvtSolution] = []
    fix_epochs: list[int] = []
    if len(live) >= 4:
        batch = eph_mod.stack_ephemeris([ch.eph for ch in live])
        first = max(skip_epochs,
                    max(int(ch.chips.size * 0) for ch in live))
        x0 = None
        for m in range(first + pvt_interval_ms, n_epochs, pvt_interval_ms):
            pr, t_tx = observables.form_pseudoranges(live, m)
            pos, clk = eph_mod.sat_pos_clock(batch, t_tx)
            snr = np.array([ch.cn0_dbhz[m] for ch in live])
            weeks = np.array([ch.eph.week for ch in live])
            mask = pvt.precheck_mask(
                snr_dbhz=snr, week=weeks + 2048,      # 10-bit week rollover
                tow_s=t_tx, pr_m=pr,
                eph_complete=[ch.eph.complete for ch in live])
            if mask.sum() < 4:
                continue
            sol = pvt.solve_wls(pos, pr, clk, mask=mask, x0=x0)
            fixes.append(sol)
            fix_epochs.append(m)
            if sol.valid:
                x0 = np.concatenate([sol.pos_ecef, [sol.clock_bias_m]])
    return ReceiverResult(channels, fixes, fix_epochs)
