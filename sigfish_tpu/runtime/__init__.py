from .pipeline import Options, Core, process_batch, run_dtw
