"""SBAS message layer tests: continuous FEC stream, CRC framing, MT12."""
import numpy as np

from gps_jamming_tpu.models.receiver import sbas


def test_message_crc_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, 212)
    msg = sbas.build_message(7, data, preamble_idx=1)
    assert msg.size == 250
    sym = sbas.encode_stream([msg])
    # unterminated stream: the tail of the last message may not decode, so
    # append pad bits to flush the register through the message
    pad = np.zeros(8, np.int64)
    sym = sbas.encode_stream([msg, pad])
    decoded = sbas.decode_stream(sym)
    assert len(decoded) == 1
    assert decoded[0].mt == 7
    assert np.array_equal(decoded[0].data, data)


def test_mt12_time_with_noise_and_offset():
    msgs = [sbas.build_mt12(345612.0, 980, preamble_idx=0),
            sbas.build_mt12(345613.0, 980, preamble_idx=1)]
    rng = np.random.default_rng(1)
    lead = rng.integers(0, 2, 41).astype(np.int64)
    sym = sbas.encode_stream([lead] + msgs + [np.zeros(8, np.int64)])
    noisy = np.clip(sym + rng.normal(0, 0.25, sym.size), 0, 1)
    decoded = [m for m in sbas.decode_stream(noisy) if m.mt == sbas.MT12]
    assert len(decoded) >= 2
    assert decoded[0].tow_s == 345612.0
    assert decoded[0].week == 980
    assert decoded[1].tow_s == 345613.0
    # consecutive messages are exactly 250 bits apart
    assert decoded[1].bit_offset - decoded[0].bit_offset == 250
