# R6 wrapper for the Python BGM engine (reference R/BGM.R).

.bgm_defaults <- list(
  z_dim = 10L,
  use_bnn = FALSE,
  dataset = "Rdata",
  output_dir = ".",
  save_res = FALSE,
  save_model = FALSE,
  g_units = c(64L, 64L, 64L, 64L, 64L),
  e_units = c(64L, 64L, 64L, 64L, 64L),
  dz_units = c(64L, 32L, 8L),
  dx_units = c(64L, 32L, 8L),
  lr = 1e-3, lr_theta = 5e-3, lr_z = 5e-3,
  gamma = 0.0, alpha = 0.0, g_d_freq = 1L, kl_weight = 5e-5
)

#' BGM model (R6)
#'
#' @description Bayesian generative model for tabular data with NaN-based
#'   missing-data imputation; wraps `bayesgm_tpu.BGM`.
#' @export
BGM <- R6::R6Class("BGM",
  public = list(
    #' @field params Merged parameter list.
    params = NULL,

    #' @description Create a BGM model.
    #' @param params Named list of overrides for the defaults.
    #' @param random_seed Integer seed (or NULL).
    initialize = function(params = list(), random_seed = NULL) {
      self$params <- utils::modifyList(.bgm_defaults, params)
      private$seed <- random_seed
    },

    #' @description Fit on a data matrix.
    #' @param data Numeric matrix (n, x_dim).
    #' @param epochs,epochs_per_eval,batch_size Training controls.
    #' @param use_egm_init,egm_n_iter,egm_batches_per_eval EGM warm-start
    #'   controls.
    #' @param verbose 0 silences per-epoch logs.
    fit = function(data, epochs = 100L, epochs_per_eval = 5L,
                   batch_size = 32L, use_egm_init = TRUE,
                   egm_n_iter = 20000L, egm_batches_per_eval = 500L,
                   verbose = 1L) {
      data <- as.matrix(data)
      p <- self$params
      p$x_dim <- ncol(data)
      model <- .bayesgm_module()$BGM(
        params = reticulate::dict(p),
        random_seed = if (is.null(private$seed)) NULL else as.integer(private$seed))
      model$fit(data = .np_f32(data), epochs = as.integer(epochs),
                epochs_per_eval = as.integer(epochs_per_eval),
                batch_size = as.integer(batch_size),
                use_egm_init = use_egm_init, egm_n_iter = as.integer(egm_n_iter),
                egm_batches_per_eval = as.integer(egm_batches_per_eval),
                verbose = as.integer(verbose))
      private$model <- model
      invisible(self)
    },

    #' @description Impute NA entries with posterior means + intervals.
    #' @param data Matrix with NA for missing entries.
    #' @param alpha Significance level.
    #' @param return_samples Also return the posterior sample cube.
    #' @param bs Subject-batch size through the HMC sampler.
    #' @param n_mcmc,burn_in,step_size,num_leapfrog_steps,seed HMC controls.
    #' @return list(imputed = ..., interval = ...)
    predict = function(data, alpha = 0.05, return_samples = FALSE, bs = 100L,
                       n_mcmc = 5000L, burn_in = 5000L, step_size = 0.01,
                       num_leapfrog_steps = 10L, seed = 42L) {
      stopifnot(!is.null(private$model))
      data <- as.matrix(data)
      res <- private$model$predict(
        data = .np_f32(data), alpha = alpha,
        return_samples = return_samples, bs = as.integer(bs),
        n_mcmc = as.integer(n_mcmc), burn_in = as.integer(burn_in),
        step_size = step_size,
        num_leapfrog_steps = as.integer(num_leapfrog_steps),
        seed = as.integer(seed))
      list(imputed = as.matrix(res[[1]]), interval = res[[2]])
    },

    #' @description Generate synthetic samples from the prior.
    #' @param nb_samples Number of samples.
    generate = function(nb_samples = 1000L) {
      stopifnot(!is.null(private$model))
      res <- private$model$generate(nb_samples = as.integer(nb_samples))
      as.matrix(res[[1]])
    }
  ),
  private = list(model = NULL, seed = NULL)
)
