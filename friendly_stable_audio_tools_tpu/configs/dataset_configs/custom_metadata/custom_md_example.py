"""Example custom-metadata module (reference ships an equivalent).
Return extra metadata for each sample; set __reject__ to skip it.
"""


def get_custom_metadata(info, audio):
    # pass the relative path as the text prompt
    return {"prompt": info.get("relpath", "audio")}
