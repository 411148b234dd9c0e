"""Offline export (encode) throughput per codec — round-4 verdict #8.

The reference has no codec path at all; this repo's beyond-parity claim
("Compressed session export", docs/FORMATS.md) should carry a number
like everything else.  Encoding is HOST work (system libs / NumPy), so
this measures CPU realtime factor: seconds of 48 kHz stereo audio
encoded per wall second.  Writes one JSON line per codec and a summary
artifact to ``benchmarks/artifacts/export_throughput.json``.

Run: ``python benchmarks/export_throughput.py [secs]`` (default 60 s of
program-like material: tones + noise beds, mildly compressible — pure
silence flatters FLAC, pure noise punishes it).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# encoding is host work — never touch the (single-user) TPU tunnel
os.environ.setdefault("FIREWHEEL_TPU_PLATFORM", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SR = 48000


def make_audio(secs: float) -> np.ndarray:
    """Program-like stereo: a chord + slow noise bed + envelope."""
    n = int(secs * SR)
    t = np.arange(n) / SR
    rng = np.random.default_rng(5)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 0.25 * t)
    sig = (
        0.30 * np.sin(2 * np.pi * 220.0 * t)
        + 0.20 * np.sin(2 * np.pi * 277.18 * t)
        + 0.15 * np.sin(2 * np.pi * 329.63 * t)
        + 0.08 * rng.standard_normal(n)
    ) * env
    return np.stack([sig, np.roll(sig, 480)]).astype(np.float32) * 0.7


def timed(name, fn, audio_secs, trials=3):
    walls = []
    size = None
    for _ in range(trials):
        t0 = time.time()
        size = fn()
        walls.append(time.time() - t0)
    wall = float(np.median(walls))
    res = {
        "codec": name,
        "realtime_factor": round(audio_secs / wall, 1),
        "encode_wall_s": round(wall, 3),
        "audio_s": audio_secs,
        "bytes": size,
        "kbps": round(size * 8 / audio_secs / 1000, 1) if size else None,
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    audio = make_audio(secs)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    tmp = "/tmp/export_bench"
    os.makedirs(tmp, exist_ok=True)
    results = []

    from firewheel_tpu.utils import adpcm, flac_encode, mp3, opus, vorbis
    from firewheel_tpu.utils.wav import write_wav
    from firewheel_tpu.core.sample_resource import pcm_f32_to_i16

    pcm16 = np.asarray(pcm_f32_to_i16(audio))

    def wav_f32():
        p = f"{tmp}/a.wav"
        write_wav(p, audio, SR)
        return os.path.getsize(p)

    results.append(timed("wav_f32", wav_f32, secs))

    def flac():
        data = flac_encode.encode_flac(pcm16, SR)
        return len(data)

    results.append(timed("flac", flac, secs))

    def ima():
        payload, _ = adpcm.encode_ima(pcm16, 1024)
        return len(payload)

    results.append(timed("adpcm_ima", ima, secs))

    if mp3.available():
        def enc_mp3():
            p = f"{tmp}/a.mp3"
            mp3.encode_mp3(p, audio, SR)
            return os.path.getsize(p)

        results.append(timed("mp3", enc_mp3, secs))

    if vorbis.available():
        def enc_vorbis():
            p = f"{tmp}/a.ogg"
            vorbis.encode_vorbis(p, audio, SR)
            return os.path.getsize(p)

        results.append(timed("vorbis", enc_vorbis, secs))

    if opus.available():
        def enc_opus():
            p = f"{tmp}/a.opus"
            opus.encode_opus(p, audio, SR)
            return os.path.getsize(p)

        results.append(timed("opus", enc_opus, secs))

    artifact = {
        "what": "offline export realtime factors (host encode, "
                "48 kHz stereo program material)",
        "host_cpus": os.cpu_count(),
        "results": results,
    }
    path = os.path.join(out_dir, "export_throughput.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
