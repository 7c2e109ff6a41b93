"""CLI entry points (SURVEY.md §7 step 5): ocr-service / ocr-client."""
