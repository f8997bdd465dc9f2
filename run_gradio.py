#!/usr/bin/env python3
"""Gradio launcher (reference `run_gradio.py:10-34`)."""

import argparse


def main():
    from friendly_stable_audio_tools_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--pretrained-name", type=str, default=None)
    p.add_argument("--pretransform-ckpt-path", type=str, default=None)
    p.add_argument("--share", action="store_true")
    p.add_argument("--username", type=str, default=None)
    p.add_argument("--password", type=str, default=None)
    p.add_argument("--model-half", action="store_true")
    args = p.parse_args()

    from friendly_stable_audio_tools_tpu.interface.gradio import create_ui

    ui = create_ui(
        model_config=args.model_config,
        ckpt_path=args.ckpt_path,
        pretrained_name=args.pretrained_name,
        pretransform_ckpt_path=args.pretransform_ckpt_path,
        model_half=args.model_half,
    )
    auth = (args.username, args.password) if args.username and args.password else None
    ui.queue()
    ui.launch(share=args.share, auth=auth)


if __name__ == "__main__":
    main()
