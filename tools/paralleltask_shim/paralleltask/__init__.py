"""Minimal local-execution stand-in for the `paralleltask` pip package.

The reference pipeline driver (/root/reference/source/nextPolish) only needs
the API subset below (SURVEY.md L5): split a multi-line shell file into jobs
(`group` consecutive lines per job), run each job in its own work directory,
track done-markers so finished tasks are skipped on re-invocation, and expose
failed jobs.  Everything runs serially in-process — this shim exists solely
so the *reference* pipeline can be executed as a byte-parity oracle in tests
(tools/run_reference_pipeline.py); it is not part of nextpolish_tpu.
"""
from __future__ import annotations

import os
import subprocess


class _Job:
    def __init__(self, path: str):
        self.path = path
        self.err = path + ".e"

    def done(self) -> bool:
        return os.path.exists(self.path + ".done")


class _Run:
    def __init__(self, jobs):
        self.jobs = jobs

    @property
    def unfinished_jobs(self):
        return [j for j in self.jobs if not j.done()]

    def start(self):
        for j in self.unfinished_jobs:
            d = os.path.dirname(j.path)
            with open(j.err, "wb") as err, open(j.path + ".o", "wb") as out:
                rc = subprocess.call(["bash", os.path.basename(j.path)],
                                     cwd=d, stdout=out, stderr=err)
            if rc == 0:
                open(j.path + ".done", "w").close()

    def is_finished(self) -> bool:
        return not self.unfinished_jobs

    def rerun(self):
        self.start()


class Task:
    def __init__(self, shellfile: str, dir_prefix: str = "work",
                 job_prefix: str = "job", convert_path: bool = False,
                 group: int = 1, **_kw):
        self.shellfile = shellfile
        self.run = None
        with open(shellfile) as fh:
            lines = [ln for ln in (l.strip() for l in fh) if ln]
        groups = [lines[i:i + group] for i in range(0, len(lines), group)]
        workroot = shellfile + ".work"
        os.makedirs(workroot, exist_ok=True)
        self.jobs = []
        for i, cmds in enumerate(groups):
            d = os.path.join(workroot, "%s%d" % (dir_prefix, i))
            os.makedirs(d, exist_ok=True)
            jpath = os.path.join(d, "%s%d.sh" % (job_prefix, i))
            body = "set -e\n" + "\n".join(cmds) + "\n"
            if not (os.path.exists(jpath) and open(jpath).read() == body):
                with open(jpath, "w") as fh:
                    fh.write(body)
                # content changed -> job must rerun
                if os.path.exists(jpath + ".done"):
                    os.unlink(jpath + ".done")
            self.jobs.append(_Job(jpath))

    def is_finished(self) -> bool:
        return os.path.exists(self.shellfile + ".done.all")

    def set_task_finished(self):
        open(self.shellfile + ".done.all", "w").close()

    def set_run(self, **_kw):
        self.run = _Run(self.jobs)
