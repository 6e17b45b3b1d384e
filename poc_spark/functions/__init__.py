from poc_spark.functions.chat_parse import (  # noqa: F401
    CHAT_LINE_PATTERN,
    is_media_omitted,
    is_message_format,
    normalize_sender,
    parse_chat_lines,
)
