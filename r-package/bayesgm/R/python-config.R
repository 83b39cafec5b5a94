# Python environment configuration for the bayesgm_tpu backend.
# Mirrors the reference contract (r-package/bayesgm/R/python-config.R):
# RETICULATE_PYTHON selects the interpreter; BAYESGM_PYTHONPATH optionally
# points at a source checkout of the Python package.

.bayesgm_env <- new.env(parent = emptyenv())

#' Configure the Python backend for bayesgm.
#'
#' @param python Optional path to the Python interpreter. Defaults to the
#'   RETICULATE_PYTHON environment variable when set.
#' @param pythonpath Optional directory prepended to sys.path (e.g. a source
#'   checkout). Defaults to the BAYESGM_PYTHONPATH environment variable.
#' @export
configure_bayesgm <- function(python = NULL, pythonpath = NULL) {
  if (is.null(python)) python <- Sys.getenv("RETICULATE_PYTHON", unset = NA)
  if (!is.na(python) && nzchar(python)) {
    reticulate::use_python(python, required = TRUE)
  }
  if (is.null(pythonpath)) pythonpath <- Sys.getenv("BAYESGM_PYTHONPATH", unset = NA)
  if (!is.na(pythonpath) && nzchar(pythonpath)) {
    sys <- reticulate::import("sys", convert = FALSE)
    sys$path$insert(0L, pythonpath)
  }
  invisible(TRUE)
}

#' Check whether the Python bayesgm_tpu module can be imported.
#' @export
bayesgm_available <- function() {
  tryCatch({
    configure_bayesgm()
    reticulate::py_module_available("bayesgm_tpu")
  }, error = function(e) FALSE)
}

#' Install the Python backend with pip.
#' @param package Package spec passed to pip (default "bayesgm-tpu").
#' @export
install_bayesgm_python <- function(package = "bayesgm-tpu") {
  reticulate::py_install(package, pip = TRUE)
}

.bayesgm_module <- function() {
  if (is.null(.bayesgm_env$module)) {
    configure_bayesgm()
    .bayesgm_env$module <- reticulate::import("bayesgm_tpu", delay_load = FALSE)
  }
  .bayesgm_env$module
}

# float32 numpy marshalling helper
.np_f32 <- function(x) {
  np <- reticulate::import("numpy", convert = FALSE)
  np$asarray(x, dtype = "float32")
}

.validate_triplet <- function(x, y, v) {
  x <- as.matrix(x); y <- as.matrix(y); v <- as.matrix(v)
  stopifnot(nrow(x) == nrow(y), nrow(y) == nrow(v))
  if (ncol(x) != 1L) x <- matrix(x, ncol = 1L)
  if (ncol(y) != 1L) y <- matrix(y, ncol = 1L)
  list(x = x, y = y, v = v)
}
