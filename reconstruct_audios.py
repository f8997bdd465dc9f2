#!/usr/bin/env python3
"""VAE folder-reconstruction CLI.

Parity target: reference `reconstruct_audios.py:40-155` — chunked
encode->decode with crossfade over a folder of audio files, chunk size and
overlap derived from `--frame-duration`/`--overlap-rate`, file-level work
sharding `[rank::world_size]`.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", type=str, required=True, help="Model config file (json).")
    p.add_argument("--ckpt-path", type=str, default="", help="Pretrained (unwrapped) checkpoint.")
    p.add_argument("--audio-dir", type=str, required=True, help="Directory of audio files to reconstruct.")
    p.add_argument("--output-dir", type=str, required=True, help="Directory for reconstructed audio.")
    p.add_argument("--frame-duration", type=float, default=1.0, help="Chunk duration in seconds.")
    p.add_argument("--overlap-rate", type=float, default=0.01, help="Chunk overlap rate for crossfade.")
    p.add_argument("--batch-size", type=int, default=20, help="Micro-batch size of chunk processing.")
    return p.parse_args()


def main():
    from friendly_stable_audio_tools_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    args = get_args()

    import jax

    from friendly_stable_audio_tools_tpu.data.dataset import get_audio_filenames, load_audio_file, resample_audio
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.models.utils import load_ckpt_state_dict
    from friendly_stable_audio_tools_tpu.utils.audio_utils import write_wav
    from friendly_stable_audio_tools_tpu.utils.common import copy_state_dict, count_parameters, get_rank, get_world_size

    with open(args.model_config) as f:
        model_config = json.load(f)

    model = create_model_from_config(model_config, init_rng=jax.random.PRNGKey(0))
    if args.ckpt_path:
        from friendly_stable_audio_tools_tpu.models.utils import load_unwrapped_checkpoint

        load_unwrapped_checkpoint(model, args.ckpt_path)

    rank, world_size = get_rank(), get_world_size()

    sr = model.sample_rate
    compress_ratio = model.downsampling_ratio
    chunk_size = int((args.frame_duration * sr) / compress_ratio)
    overlap = max(int((args.frame_duration * sr * args.overlap_rate) / compress_ratio), 1)

    if rank == 0:
        print("=== Model Info ===")
        print(f"\tSample rate:\t{sr}")
        print(f"\tIn/Out ch:\t{model.in_channels} / {model.out_channels}")
        print(f"\tCompression:\t{compress_ratio}")
        print(f"\tLatent dim:\t{model.latent_dim}")
        print(f"\tParams:\t{count_parameters(model.params) / 1e6:.2f} [million]")
        print(f"\tChunk size:\t{chunk_size} latents, overlap {overlap}")

    audio_files = get_audio_filenames(args.audio_dir)
    output_dir = Path(args.output_dir)
    if rank == 0:
        output_dir.mkdir(parents=True, exist_ok=True)
    audio_files = audio_files[rank::world_size]

    for path in audio_files:
        audio, in_sr = load_audio_file(path)
        audio = resample_audio(audio, in_sr, sr)
        # channel coercion + pad to a multiple of the compression ratio
        from friendly_stable_audio_tools_tpu.inference.utils import set_audio_channels

        audio = set_audio_channels(audio[None], model.in_channels)
        t = audio.shape[-1]
        pad = (compress_ratio - t % compress_ratio) % compress_ratio
        if pad:
            audio = np.pad(audio, ((0, 0), (0, 0), (0, pad)))

        recon = model.reconstruct_audio(
            audio, chunked=True, chunk_size=chunk_size, overlap=overlap,
            max_batch_size=args.batch_size,
        )
        recon = np.asarray(recon)[0, :, :t]
        out_path = output_dir / (Path(path).stem + ".wav")
        write_wav(str(out_path), sr, recon)
        print(f"[rank {rank}] {path} -> {out_path}")

    print(f"->->-> Rank-{rank}: Finished.")


if __name__ == "__main__":
    main()
