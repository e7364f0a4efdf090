#!/usr/bin/env python
"""Interactive chat demo.

Drives the ``Chat`` helper (ref ``conversation.py`` Chat surface) from the
terminal: upload an image, ask questions, stream answers.

    python scripts/demo_chat.py --image photo.jpg [--config cfg.yaml]

Without a config (or checkpoints), a tiny random-weight model answers —
useful for exercising the full pipeline interactively.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--config", default=None, help="YAML with a model block")
    parser.add_argument("--template", default="minigptv2")
    parser.add_argument("--max-new-tokens", type=int, default=20)
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    from PIL import Image

    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.common.config import Config, ConfigNode
    from certifiedgpt_tpu.common.registry import registry
    from certifiedgpt_tpu.data.processors import Blip2ImageEvalProcessor
    from certifiedgpt_tpu.models.conversation import Chat

    if args.config:
        model_cfg = Config(args.config).model
    else:
        model_cfg = ConfigNode({"model_size": "tiny"})
    model = registry.get_model_class("minigpt4").from_config(model_cfg)

    chat = Chat(
        model,
        Blip2ImageEvalProcessor(image_size=model.cfg.vit.img_size),
        template=args.template,
    )
    chat.upload_img(Image.open(args.image))
    print(f"Image loaded: {args.image}. Ask questions (ctrl-d to quit).")

    while True:
        try:
            question = input("you> ").strip()
        except EOFError:
            break
        if not question:
            continue
        chat.ask(question)
        if args.stream:
            print("bot> ", end="", flush=True)
            for piece in chat.stream_answer(max_new_tokens=args.max_new_tokens):
                print(piece, end="", flush=True)
            print()
        else:
            print("bot>", chat.answer(max_new_tokens=args.max_new_tokens))


if __name__ == "__main__":
    main()
