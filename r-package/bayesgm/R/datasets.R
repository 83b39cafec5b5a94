# Dataset loaders calling into the Python samplers through reticulate.
# Kwarg surface, defaults, and return shapes match the reference
# r-package/bayesgm/R/datasets.R:1-77; the marshalling is re-expressed on
# this package's .bayesgm_module() helper.

#' Load the Hirano-Imbens continuous-treatment simulation.
#'
#' @param N Sample size.
#' @param v_dim Covariate dimension.
#' @param seed Random seed for the data draw.
#' @param batch_size Batch size stored on the Python sampler.
#' @return list(x, y, v) of R matrices (treatment, outcome, covariates).
#' @export
load_sim_hirano_imbens <- function(N = 1000L,
                                   v_dim = 20L,
                                   seed = 0L,
                                   batch_size = 32L) {
  m <- .bayesgm_module()
  sampler <- m$Sim_Hirano_Imbens_sampler(
    batch_size = as.integer(batch_size),
    N = as.integer(N),
    v_dim = as.integer(v_dim),
    seed = as.integer(seed)
  )
  triplet <- sampler$load_all()
  list(
    x = reticulate::py_to_r(triplet[[1]]),
    y = reticulate::py_to_r(triplet[[2]]),
    v = reticulate::py_to_r(triplet[[3]])
  )
}

#' Load the heteroskedastic latent-factor simulation for BGM.
#'
#' Draws `simulate_z_hetero(n, k = z_dim, d = x_dim - 1)` and splits it with
#' sklearn's `train_test_split`, exactly as the reference loader does: the
#' response is appended as the LAST column of `data_train`, and the test
#' block carries an NA response column for imputation.
#'
#' @param n Sample size before the split.
#' @param z_dim Latent dimension of the simulator.
#' @param x_dim Total observed columns INCLUDING the response
#'   (so `x_dim - 1` simulated features); must be >= 2.
#' @param seed Random seed for the simulator draw.
#' @param test_size Fraction held out as the test split.
#' @param split_seed `random_state` of the sklearn split.
#' @return list(X_train, X_test, Y_train, Y_test, data_train, data_test).
#' @export
load_sim_heteroskedastic <- function(n = 20000L,
                                     z_dim = 10L,
                                     x_dim = 100L,
                                     seed = 42L,
                                     test_size = 0.1,
                                     split_seed = 123L) {
  if (x_dim < 2L) {
    stop("`x_dim` must be at least 2 so the last column can hold the response.",
         call. = FALSE)
  }
  m <- .bayesgm_module()
  model_selection <- tryCatch(
    reticulate::import("sklearn.model_selection", delay_load = FALSE),
    error = function(e) {
      stop(paste(
        "The Python module 'sklearn.model_selection' is required for",
        "load_sim_heteroskedastic(). Install scikit-learn in the configured",
        "Python environment."
      ), call. = FALSE)
    }
  )

  sim <- m$simulate_z_hetero(
    n = as.integer(n),
    k = as.integer(z_dim),
    d = as.integer(x_dim - 1L),
    seed = as.integer(seed)
  )
  split <- model_selection$train_test_split(
    sim[[1]],
    sim[[2]],
    test_size = test_size,
    random_state = as.integer(split_seed)
  )

  X_train <- as.matrix(reticulate::py_to_r(split[[1]]))
  X_test <- as.matrix(reticulate::py_to_r(split[[2]]))
  Y_train <- matrix(as.numeric(reticulate::py_to_r(split[[3]])), ncol = 1L)
  Y_test <- matrix(as.numeric(reticulate::py_to_r(split[[4]])), ncol = 1L)

  list(
    X_train = X_train,
    X_test = X_test,
    Y_train = Y_train,
    Y_test = Y_test,
    data_train = cbind(X_train, Y_train),
    data_test = cbind(X_test, matrix(NA_real_, nrow = nrow(X_test), ncol = 1L))
  )
}
