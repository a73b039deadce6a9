"""Chat templating + image-token splitting for the LLaVA-Qwen2 models.

ChatML prompt (reference conv_qwen, llava/conversation.py):
    <|im_start|>system\nYou are a helpful assistant.<|im_end|>\n
    <|im_start|>user\n{message}<|im_end|>\n<|im_start|>assistant\n

``tokenize_with_image``: tokenizes around the "<image>" placeholder and
inserts IMAGE_TOKEN_INDEX (-200), the reference's tokenizer_image_token
mechanism (llava/mm_utils.py). Also reports the sys/inst token counts the
harness stashes for the token reducer (video_dataset.py:385-397).
"""

from __future__ import annotations

DEFAULT_IMAGE_TOKEN = "<image>"
IMAGE_TOKEN_INDEX = -200

SYSTEM = "You are a helpful assistant."


def build_chat_prompt(message: str) -> str:
    return (
        f"<|im_start|>system\n{SYSTEM}<|im_end|>\n"
        f"<|im_start|>user\n{message}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


def build_video_message(conversations: str, time_instruction: str | None = None) -> str:
    """Prefix the prompt with the image placeholder (+ optional time
    instruction, video_dataset.py:375-379)."""
    body = conversations.replace(DEFAULT_IMAGE_TOKEN, "")
    if time_instruction:
        return f"{DEFAULT_IMAGE_TOKEN}\n{time_instruction}\n{body}"
    return f"{DEFAULT_IMAGE_TOKEN}\n{body}"


def time_instruction(video_time: float, num_frames: int, frame_time: str) -> str:
    return (
        f"The video lasts for {video_time:.2f} seconds, and {num_frames} frames "
        f"are uniformly sampled from it. These frames are located at {frame_time}. "
        f"Please answer the following questions related to this video."
    )


def tokenize_with_image(prompt: str, tokenizer):
    """-> (input_ids list incl. IMAGE_TOKEN_INDEX, sys_len, inst_len)."""
    parts = prompt.split(DEFAULT_IMAGE_TOKEN)
    if len(parts) != 2:
        raise ValueError(f"prompt must contain exactly one {DEFAULT_IMAGE_TOKEN}")
    pre = tokenizer.encode(parts[0], add_special_tokens=False)
    post = tokenizer.encode(parts[1], add_special_tokens=False)
    ids = pre + [IMAGE_TOKEN_INDEX] + post
    return ids, len(pre), len(post)
