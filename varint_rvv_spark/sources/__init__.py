from .pages import PAGES_SCHEMA, gen_pages_numpy, pages_df  # noqa: F401
