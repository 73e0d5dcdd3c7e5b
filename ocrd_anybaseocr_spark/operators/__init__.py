from .extract import extract_spans, page_index
from .pipeline import run_pipeline, process_pages
from .fold import fold_structure
