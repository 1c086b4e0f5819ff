"""CLI orchestrator (reference: run.py).

Same flag surface: ``--config --save-mode {database,csv} --dry-run
--performance-report --no-minio-sync --load-metadata`` plus
``--input/--output`` overrides. Wires DB + monitor + processor, runs
retention cleanup, and writes run artifacts.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
from datetime import datetime
from pathlib import Path

from audio_processor_tpu.config import PipelineConfig, load_config

logger = logging.getLogger(__name__)


def setup_logging(logs_folder: str) -> None:
    """Console + daily-rotating file logging
    (reference: run.py:32-49, pipeline.py:164-186)."""
    from logging.handlers import TimedRotatingFileHandler

    Path(logs_folder).mkdir(parents=True, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = Path(logs_folder) / f"tpu_processing_{ts}.log"
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    file_handler = TimedRotatingFileHandler(str(log_file), when="D",
                                            interval=1, backupCount=14)
    file_handler.setFormatter(fmt)
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    root.addHandler(file_handler)
    root.addHandler(console)


def validate_config(cfg: PipelineConfig) -> None:
    cfg.validate()


def check_disk_space(min_free_gb: float) -> bool:
    """Disk-space gate (reference: run.py:137-143)."""
    free_gb = shutil.disk_usage("/").free / 1024 ** 3
    if free_gb < min_free_gb:
        logger.error("Insufficient disk space: %.1fGB free < %.1fGB "
                     "required", free_gb, min_free_gb)
        return False
    return True


def print_system_info() -> None:
    import jax

    logger.info("JAX devices: %s", jax.devices())
    try:
        import psutil

        vm = psutil.virtual_memory()
        logger.info("RAM: %.1fGB total, %.1f%% used",
                    vm.total / 1024 ** 3, vm.percent)
    except ImportError:
        pass


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native call-center audio analytics pipeline")
    p.add_argument("--config", default="config.yaml",
                   help="YAML configuration file")
    p.add_argument("--save-mode", choices=["database", "csv"],
                   default="database")
    p.add_argument("--dry-run", action="store_true",
                   help="scan and estimate only")
    p.add_argument("--performance-report", action="store_true")
    p.add_argument("--no-minio-sync", action="store_true")
    p.add_argument("--load-metadata", action="store_true")
    p.add_argument("--input", help="override input_folder")
    p.add_argument("--output", help="override output_folder")
    p.add_argument("--stats", action="store_true",
                   help="print database processing stats and exit")
    p.add_argument("--watch", type=float, metavar="SECONDS", default=0,
                   help="continuous mode: rescan the input folder every "
                        "N seconds instead of exiting (the reference "
                        "only supports cron re-invocation); idempotence "
                        "markers make each sweep incremental")
    p.add_argument("--serve", action="store_true",
                   help="online mode: HTTP inference server with "
                        "request micro-batching into the same fused "
                        "device program (serving.py)")
    p.add_argument("--port", type=int, default=8080,
                   help="--serve listen port")
    p.add_argument("--grpc-port", type=int, default=0,
                   help="with --serve: also expose the gRPC service "
                        "on this port (0 = HTTP only)")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    overrides = {}
    if args.input:
        overrides["input_folder"] = args.input
    if args.output:
        overrides["output_folder"] = args.output
    overrides["save_csv_results"] = args.save_mode == "csv"
    cfg = load_config(args.config, overrides)

    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()  # ~10x faster cold starts on cached hosts
    setup_logging(cfg.logs_folder)
    # Multi-host bootstrap (no-op without JAX_COORDINATOR_ADDRESS):
    # wires jax.distributed so engine.run() shards calls across hosts
    # by call-id hash (parallel/distributed, SURVEY.md §2.4).
    from audio_processor_tpu.parallel.distributed import (
        initialize_distributed,
    )

    initialize_distributed()
    try:
        validate_config(cfg)
    except ValueError as e:
        logger.error("Invalid configuration: %s", e)
        return 2

    min_free = float(os.environ.get("MIN_FREE_DISK_GB", "5"))
    if not check_disk_space(min_free):
        return 3
    print_system_info()

    # MinIO ingest (reference: run.py:88-126, 190).
    if cfg.minio.enabled and not args.no_minio_sync:
        from audio_processor_tpu.host.minio_sync import MinIOSyncManager

        MinIOSyncManager(cfg).sync_to_local(cfg.input_folder)

    # Dry run: scan + ETA only (reference: run.py:231-242).
    if args.dry_run:
        from audio_processor_tpu.io.scanner import AudioFileScanner

        files = AudioFileScanner(cfg).scan_files_parallel(
            Path(cfg.input_folder))
        logger.info("Dry run: %d valid files found", len(files))
        logger.info("Estimated processing time: %.1f minutes "
                    "(at 3 s/file on TPU)", len(files) * 3 / 60)
        return 0

    # Database (reference: run.py:203).
    db_manager = None
    if args.save_mode == "database" or args.load_metadata or args.stats:
        from audio_processor_tpu.host.db import DatabaseManager

        try:
            db_manager = DatabaseManager(cfg)
        except Exception as e:
            logger.error("Database unavailable: %s", e)
            if args.save_mode == "database":
                return 4

    if args.stats:
        if db_manager is None:
            logger.error("--stats requires a database")
            return 4
        import json as _json

        print(_json.dumps(db_manager.get_processing_stats(), indent=2))
        db_manager.close()
        return 0

    if args.load_metadata and db_manager is not None:
        from audio_processor_tpu.host.metadata import load_metadata

        load_metadata(db_manager, cfg)

    # Monitor (reference: run.py:212-213, 229).
    monitor = None
    if cfg.enable_performance_monitoring:
        from audio_processor_tpu.obs.monitor import PerformanceMonitor

        monitor = PerformanceMonitor(cfg)
        monitor.start_monitoring()

    if args.serve:
        from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer
        from audio_processor_tpu.serving import serve

        analyzer = SentimentAnalyzer(cfg, db_manager=db_manager)
        server = serve(cfg, port=args.port,
                       sentiment_analyzer=analyzer)
        logger.info("Online inference server on port %d "
                    "(POST /v1/transcribe, GET /healthz, /v1/stats)",
                    args.port)
        grpc_server = None
        if args.grpc_port:
            from audio_processor_tpu.grpc_serving import (
                GrpcInferenceServer,
            )

            grpc_server = GrpcInferenceServer(server.service,
                                              args.grpc_port)
            grpc_server.start()
        # Graceful Docker/K8s shutdown: SIGTERM drains like Ctrl-C.
        # server.shutdown() must run on another thread — it joins the
        # serve_forever loop this (main) thread is inside.
        import signal as _signal
        import threading as _threading

        def _sigterm(_signum, _frame):
            logger.info("SIGTERM received; shutting down server")
            _threading.Thread(target=server.shutdown,
                              daemon=True).start()

        _signal.signal(_signal.SIGTERM, _sigterm)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            logger.info("Interrupted; shutting down server")
        finally:
            if grpc_server is not None:
                grpc_server.stop()
            server.service.close()
            server.server_close()
            if monitor is not None:
                monitor.stop_monitoring()
        return 0

    from audio_processor_tpu.host.topics import TopicClassifier
    from audio_processor_tpu.pipeline.engine import DataProcessor

    topic_classifier = TopicClassifier(cfg)
    processor = DataProcessor(cfg, db_manager=db_manager,
                              topic_classifier=topic_classifier,
                              monitor=monitor)
    if monitor is not None:
        monitor.add_callback("queues", processor.get_queue_metrics)

    processor.cleanup_old_artifacts()

    rc = 0
    try:
        from audio_processor_tpu.obs.profiler import maybe_trace

        with maybe_trace(cfg):
            processor.run()
        while args.watch > 0:
            import time as _time

            logger.info("Watch mode: sleeping %.0fs before next sweep",
                        args.watch)
            _time.sleep(args.watch)
            if cfg.minio.enabled and not args.no_minio_sync:
                from audio_processor_tpu.host.minio_sync import (
                    MinIOSyncManager,
                )

                MinIOSyncManager(cfg).sync_to_local(cfg.input_folder)
            processor.run()
    except KeyboardInterrupt:
        logger.info("Interrupted; shutting down")
    except Exception as e:
        logger.exception("Processing failed: %s", e)
        rc = 1
    finally:
        processor.close()
        if monitor is not None:
            monitor.stop_monitoring()
            if args.performance_report:
                monitor.save_performance_report(cfg.output_folder)
        if db_manager is not None:
            db_manager.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
