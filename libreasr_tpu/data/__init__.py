from .language import CharLanguage, get_language  # noqa: F401
