"""Offline data factory: split -> render (latex/dvipng/ImageMagick) -> pickle.

Host-side CLIs mirroring the reference's data_wrangling scripts; rendering
stays on the host (these external binaries are the reference's only native
components; SURVEY.md §2.5)."""
