"""Minimal WAV -> FLAC encoder against the public flake-tpu API.

The canonical call sequence (reference analogue: util/api_example.c —
set defaults, validate, init, per-block encode, STREAMINFO rewrite),
expressed with the flake-tpu lifecycle.
"""

import sys

import numpy as np

from flake_tpu import Encoder, StreamConfig, set_defaults
from flake_tpu import metadata
from flake_tpu.io import open_pcm


def main(argv):
    if len(argv) != 3:
        print("usage: api_example.py <input.wav> <output.flac>")
        return 1
    infile, outfile = argv[1], argv[2]

    with open(infile, "rb") as f:
        reader = open_pcm(f)
        info = reader.info

        # 1. parameters: level preset + stream description
        params = set_defaults(5)
        cfg = StreamConfig(channels=info.channels,
                           sample_rate=info.sample_rate,
                           bits_per_sample=info.bits_per_sample,
                           samples=info.samples, params=params)

        # 2. encoder init (validates params, like flake_encode_init)
        enc = Encoder(cfg)

        with open(outfile, "wb") as out:
            # 3. stream header
            out.write(enc.header())

            # 4. per-block encoding
            while True:
                pcm = reader.read_samples(params.block_size * 64)
                if pcm.shape[0] == 0:
                    break
                out.write(enc.encode(pcm))
            out.write(enc.finish())

            # 5. STREAMINFO rewrite with final MD5 / max frame size
            out.seek(8)
            out.write(metadata.write_streaminfo(enc.streaminfo()))

    print(f"encoded {infile} -> {outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
