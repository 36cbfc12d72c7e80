"""Per-constellation receiver adapters: Galileo E1B and GLONASS L1OF
observable builders + satellite state, plugged into the generic
acquisition/tracking/PVT loop (receiver.run_receiver).

The reference hardwires the per-system differences across `sdrinit.c`
channel plans, `sdrnav_{gps,gal,glo}.c` decoders and `sdrpvt.c:440-575`
satPos dispatch; here each system is a thin host-side adapter over the
same device kernels:

- Galileo: 4 ms epochs are exactly one E1B primary-code period, so each
  tracking epoch's prompt I IS one 250 sps I/NAV symbol — no bit sync
  needed; page sync + CRC anchor transmit time (sdrnav_gal.c role).
- GLONASS: 1 ms epochs, 10 per 100 sps line symbol (meander layer);
  time-mark correlation anchors transmit time (sdrnav_glo.c role);
  satellite state is RK4 extrapolation of the broadcast pos/vel/acc
  (sdrpvt.c:528-575 role) instead of a Kepler solve.
"""
from __future__ import annotations

import numpy as np

from ...utils import constants as C
from . import ephemeris as eph_mod
from . import galileo as gal
from . import glonass as glo
from . import observables as obs_mod


# ---------------------------------------------------------------------------
# Galileo
# ---------------------------------------------------------------------------

def build_galileo_observables(prn: int, i_prompt: np.ndarray,
                              code_rem: np.ndarray, carr_freq: np.ndarray,
                              cn0: np.ndarray, skip_epochs: int,
                              sample_offset: float = 0.0,
                              epoch_samples: int = 0,
                              ) -> obs_mod.ChannelObservables | None:
    """One E1B channel: prompt signs -> I/NAV decode -> chip-count anchor.

    Epochs are 4 ms (one code period of 8184 BOC half-chips at 2.046 Mcps);
    epoch k's prompt is the symbol transmitted starting at that epoch's
    window-start code boundary, so a page anchor at symbol s maps to the
    code-period boundary at epoch skip_epochs + s.
    """
    ip = np.asarray(i_prompt, np.float64)
    sym01 = (ip[skip_epochs:] < 0.0).astype(np.float64)   # sign -> symbol
    eph, anchors = gal.decode_inav_stream(sym01, prn=prn)
    if not anchors or not gal.inav_complete(eph):
        return None
    chips = obs_mod.accumulate_chips(code_rem, code_len=gal.BOC_LEN)
    pos, tow = anchors[0]
    e_b = skip_epochs + int(pos)
    anchor_chip = gal.BOC_LEN * round(chips[e_b] / gal.BOC_LEN)
    return obs_mod.ChannelObservables(
        prn=prn, eph=eph, chips=chips, anchor_chip=float(anchor_chip),
        anchor_tow=float(tow), cn0_dbhz=np.asarray(cn0, np.float64),
        doppler_hz=np.asarray(carr_freq, np.float64),
        sync_quality=1.0, chip_rate_hz=gal.BOC_RATE,
        sample_offset=sample_offset, epoch_samples=epoch_samples)


# ---------------------------------------------------------------------------
# GLONASS
# ---------------------------------------------------------------------------

def build_glonass_observables(freq_ch: int, i_prompt: np.ndarray,
                              code_rem: np.ndarray, carr_freq: np.ndarray,
                              cn0: np.ndarray, skip_epochs: int,
                              min_sync_quality: float = 0.8,
                              sample_offset: float = 0.0,
                              epoch_samples: int = 0,
                              ) -> obs_mod.ChannelObservables | None:
    """One L1OF channel: symbol sync (10 epochs / 100 sps symbol) ->
    GNAV string decode -> chip-count anchor at the time-mark edge."""
    phase, quality = obs_mod.bit_sync(i_prompt, start_epoch=skip_epochs,
                                      bit_epochs=10)
    if quality < min_sync_quality:
        return None
    bits01, starts, _ = obs_mod.extract_bits(i_prompt, phase, bit_epochs=10)
    # +I transmits symbol 0 (sim convention 0 -> +1); polarity ambiguity is
    # resolved by the two-sided time-mark match in the decoder
    sym01 = 1 - bits01
    eph, anchors = glo.decode_gnav_stream(sym01, freq_ch=freq_ch)
    if not anchors or not eph.complete:
        return None
    chips = obs_mod.accumulate_chips(code_rem, code_len=C.GLO_CODE_LEN)
    pos, tk = anchors[0]
    e_b = int(starts[pos])
    anchor_chip = C.GLO_CODE_LEN * round(chips[e_b] / C.GLO_CODE_LEN)
    return obs_mod.ChannelObservables(
        prn=freq_ch, eph=eph, chips=chips, anchor_chip=float(anchor_chip),
        anchor_tow=float(tk), cn0_dbhz=np.asarray(cn0, np.float64),
        doppler_hz=np.asarray(carr_freq, np.float64),
        sync_quality=quality, chip_rate_hz=C.GLO_CHIP_RATE_HZ,
        sample_offset=sample_offset, epoch_samples=epoch_samples)


def glonass_sat_pos_clock(gephs: list[glo.GloEphemeris], t_tx: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Satellite ECEF positions + clock offsets at per-sat transmit times.

    RK4 extrapolation of the broadcast state from tb (sdrpvt.c:528-575
    role); clock = -tau + gamma*(t - tb) (ICD sign convention: tau is the
    SV-ahead-of-system offset, subtracted like sdrnav_glo.c's taun).
    """
    t_tx = np.asarray(t_tx, np.float64)
    # ONE batched RK4 over all satellites (the integrator is fully
    # vectorized; the former per-sat loop paid 64 tiny-array numpy
    # dispatches per satellite per PVT epoch — ~60% of the GLONASS
    # host-decode wall on a 24 s capture)
    pos0 = np.stack([np.asarray(g.pos_m, np.float64) for g in gephs])
    vel0 = np.stack([np.asarray(g.vel_mps, np.float64) for g in gephs])
    acc = np.stack([np.asarray(g.acc_mps2, np.float64) for g in gephs])
    dt = t_tx - np.array([g.tb_s for g in gephs], np.float64)
    pos = eph_mod.glonass_extrapolate(pos0, vel0, acc, dt)
    clk = (np.array([-g.tau_s for g in gephs], np.float64)
           + np.array([g.gamma for g in gephs], np.float64) * dt)
    return pos, clk


# ---------------------------------------------------------------------------
# SBAS
# ---------------------------------------------------------------------------

def decode_sbas_channel(i_prompt: np.ndarray, skip_epochs: int = 1000,
                        min_sync_quality: float = 0.5) -> list:
    """One SBAS L1 channel: prompt I -> 500 sps symbols -> FEC messages.

    Symbols are 2 ms (2 tracking epochs); symbol sync reuses the sign-flip
    histogram (checksync role, sdrnav.c:126-144 with the SBAS symbol
    length). The rate-1/2 K=7 coder is continuous and transparent (both
    generators have odd weight), so data polarity and symbol-pair
    alignment are resolved by trial: decode all four (polarity x pair
    phase) hypotheses and keep whichever yields CRC-valid messages
    (predecodefec + findpreamble roles, sdrnav.c:194-236, :284-328;
    MT12 fields per sdrnav_sbs.c:47-97).
    """
    from . import sbas

    phase, quality = obs_mod.bit_sync(i_prompt, start_epoch=skip_epochs,
                                      bit_epochs=2)
    if quality < min_sync_quality:
        return []
    _, _, sums = obs_mod.extract_bits(i_prompt, phase, bit_epochs=2)
    scale = np.median(np.abs(sums))
    if scale <= 0 or sums.size < 2 * sbas.MSG_BITS:
        return []
    # soft probability of symbol '1' from the normalized correlator sum
    soft = np.clip(0.5 + sums / (4.0 * scale), 0.0, 1.0)
    for cand in (soft, soft[1:], 1.0 - soft, 1.0 - soft[1:]):
        cand = cand[: cand.size - cand.size % 2]
        msgs = sbas.decode_stream(cand)
        if msgs:
            return msgs
    return []
