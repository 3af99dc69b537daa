from .sniffer import detect_format, detect_html_xhtml, format_from_extension  # noqa: F401
